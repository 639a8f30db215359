"""Multi-host (multi-process) data-parallel scale-out.

The reference is a single-process script (SURVEY.md §2.4: no
torch.distributed anywhere); this module adds the standard JAX multi-host
recipe so the same fused train step runs unchanged across TPU pod slices:

  1. every host calls :func:`initialize_distributed` (JAX wires the
     coordinator; ``jax.devices()`` then spans ALL hosts while
     ``jax.local_devices()`` are this host's chips),
  2. each host feeds only its shard of every batch
     (:func:`process_local_indices` partitions the dataset; the Loader runs
     per-host exactly as single-host),
  3. :func:`global_batch` assembles the per-host arrays into one logically
     global, batch-sharded array (``jax.make_array_from_process_local_data``)
     — no host ever materializes the full batch,
  4. the jitted train step is UNCHANGED: the loss is a global sum, so GSPMD
     emits the cross-host gradient all-reduce over ICI/DCN automatically.

Checkpointing: Orbax's CheckpointManager used by
:class:`~singleshotpose_tpu.checkpoint.OrbaxCheckpointer` is multi-process
aware (all hosts call save/restore collectively).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from .sharding import batch_sharding

__all__ = ["initialize_distributed", "process_local_indices", "global_batch"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` wrapper (no-op when single-process).

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly only for non-standard launches.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_local_indices(n_samples: int, *,
                          process_id: Optional[int] = None,
                          num_processes: Optional[int] = None) -> np.ndarray:
    """This host's contiguous shard of dataset indices.

    Equal-sized shards (truncating the remainder) so every host contributes
    the same per-batch count — a requirement for a rectangular global batch.
    """
    pid = jax.process_index() if process_id is None else process_id
    nproc = jax.process_count() if num_processes is None else num_processes
    per = n_samples // nproc
    return np.arange(pid * per, (pid + 1) * per)


def global_batch(mesh, local_images: np.ndarray, local_labels: np.ndarray
                 ) -> Tuple[jax.Array, jax.Array]:
    """Assemble per-host arrays into global batch-sharded device arrays.

    ``local_*`` hold this process's samples only; the returned arrays are
    logically ``(num_processes · local_B, ...)``, sharded over the mesh's
    ``data`` axis, with each shard resident on the host that produced it.
    """
    imgs = jax.make_array_from_process_local_data(
        batch_sharding(mesh, np.ndim(local_images)), np.asarray(local_images))
    lbls = jax.make_array_from_process_local_data(
        batch_sharding(mesh, np.ndim(local_labels)), np.asarray(local_labels))
    return imgs, lbls
