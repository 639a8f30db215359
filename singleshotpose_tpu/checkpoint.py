"""Checkpointing: darknet binary (reference parity) + Orbax (idiomatic).

The reference persists only the darknet binary format with the ``seen``
counter in the header (reference: ``darknet.py:350-394``, §5 of SURVEY.md) —
and its resume logic is vestigial (``train.py:341-346`` zeroes ``model.seen``
immediately after loading it).  This module adds what a production framework
needs on top of :mod:`singleshotpose_tpu.weights`:

  * Orbax checkpoints of the FULL train state (params, BN stats, SGD
    momentum, seen) — async-capable, sharding-aware, atomically versioned,
  * real resume: restore state + derive (processed_batches, init_epoch),
  * retention: keep-latest-N garbage collection via Orbax's manager.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from .training import TrainState

__all__ = ["OrbaxCheckpointer", "latest_step"]


class OrbaxCheckpointer:
    """Versioned train-state checkpoints under ``directory/``.

    Layout: ``directory/<step>/state`` (Orbax composite).  ``step`` is the
    number of processed batches, mirroring the reference's batch-derived
    schedule clock.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: TrainState, *, wait: bool = False) -> None:
        tree = {"params": state.params, "batch_stats": state.batch_stats,
                "momentum": state.momentum,
                "seen": np.asarray(jax.device_get(state.seen))}
        # named item: a fresh manager can restore without a handler registry
        self.manager.save(step, args=self._ocp.args.Composite(
            state=self._ocp.args.StandardSave(tree)))
        if wait:
            self.manager.wait_until_finished()

    def restore(self, step: Optional[int] = None) -> Tuple[TrainState, int]:
        """Restore (state, step). ``step=None`` → latest."""
        if step is None:
            step = self.manager.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoints under {self.directory}")
        restored = self.manager.restore(
            step, args=self._ocp.args.Composite(
                state=self._ocp.args.StandardRestore()))["state"]
        import jax.numpy as jnp
        state = TrainState(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            momentum=restored["momentum"],
            seen=jnp.asarray(restored["seen"], jnp.int32),
        )
        return state, int(step)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()


def latest_step(directory: str) -> Optional[int]:
    """Latest checkpoint step under ``directory`` (None if none exist)."""
    import orbax.checkpoint as ocp

    try:
        mgr = ocp.CheckpointManager(os.path.abspath(directory))
    except (FileNotFoundError, ValueError):
        return None
    step = mgr.latest_step()
    mgr.close()
    return step
