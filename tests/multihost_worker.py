"""Real multi-process worker for tests/test_multihost.py.

Invoked as ``python multihost_worker.py <pid> <nproc> <port> <workdir>``:
joins a ``jax.distributed`` cluster on the CPU backend with 4 virtual
devices per process, then drives BOTH trainers over the resulting
8-device global mesh — the multi-host code paths that the in-repo tests
could previously only exercise degenerately (process_count()==1):

  * ``_multihost_local_shard`` dataset partitioning + per-host batch division,
  * ``global_batch`` / ``jax.make_array_from_process_local_data`` assembly,
  * cross-host gradient sync through the jitted global-sum loss,
  * collective Orbax save from a multi-process mesh + resume,
  * in-training eval UNDER the multi-host mesh (multi-host eval bank via
    make_array_from_callback, SPMD box-pick replication, process-0 saves),
  * standalone run_validation over the global mesh (bank + rgb transfers).

Writes a JSON result per process; the parent test asserts cross-process
agreement (replicated state must be bit-identical on every host) and the
global ``seen`` arithmetic.
"""
import json
import os
import sys

pid, nproc = int(sys.argv[1]), int(sys.argv[2])
port, workdir = sys.argv[3], sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()
assert len(jax.local_devices()) == 4

import jax.numpy as jnp  # noqa: E402

from singleshotpose_tpu.drivers import (TrainRunConfig, run_training,  # noqa: E402
                                        run_training_multi)
from singleshotpose_tpu.parallel.sharding import make_mesh  # noqa: E402


def fingerprint(tree) -> float:
    """Replicated scalar digest of a (possibly cross-host-sharded) pytree.

    Runs as one SPMD program on the global mesh — every process executes it,
    and the replicated output is readable from any local shard."""
    def digest(t):
        leaves = jax.tree.leaves(t)
        return sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves)
    return float(jax.jit(digest)(tree))


res = {}
mesh = make_mesh(dp=4, mp=2)
assert mesh.shape == {"data": 4, "model": 2}

# ---- single-object trainer: 2 epochs + collective Orbax, then resume ----
rc = TrainRunConfig(eval_every=1, eval_after=0, num_workers=0,
                    bg_dir="/nonexistent", log_every=100,
                    max_epochs_override=2, mesh=mesh,
                    orbax_dir=f"{workdir}/orbax_single",
                    orbax_every_epochs=1)
rc.compute_dtype = None
r = run_training(f"{workdir}/synth.data", f"{workdir}/tiny.cfg", None,
                 100, rc)
res["single_losses"] = [float(x) for x in r["history"]["training_losses"]]
res["single_seen"] = int(jax.device_get(r["state"].seen))
res["single_fp"] = fingerprint(r["state"].params)
res["single_mom_fp"] = fingerprint(r["state"].momentum)
# in-training eval ran UNDER the multi-host mesh (eval_every=1 → epoch 1):
# the eval bank assembled across processes, the SPMD eval pass replicated
# the box picks, and every host computed the identical metric suite
res["eval_accs"] = [float(x) for x in r["history"]["testing_accuracies"]]
res["eval_errs_px"] = [float(x)
                       for x in r["history"]["testing_errors_pixel"]]

rc2 = TrainRunConfig(eval_every=100, eval_after=100, num_workers=0,
                     bg_dir="/nonexistent", log_every=100,
                     max_epochs_override=3, mesh=mesh,
                     orbax_dir=f"{workdir}/orbax_single",
                     orbax_every_epochs=1, resume=True)
rc2.compute_dtype = None
r2 = run_training(f"{workdir}/synth.data", f"{workdir}/tiny.cfg", None,
                  100, rc2)
res["resume_losses"] = [float(x) for x in r2["history"]["training_losses"]]
res["resume_seen"] = int(jax.device_get(r2["state"].seen))
res["resume_fp"] = fingerprint(r2["state"].params)

# ---- export the final multi-host state as darknet weights -----------------
# Replicate the global state onto every device (one SPMD identity program),
# device_get the now-addressable value, write the darknet binary from
# process 0.  The parent validates it single-process — training-on-a-pod,
# eval-anywhere.
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from singleshotpose_tpu import weights as W  # noqa: E402
from singleshotpose_tpu.drivers import load_spec  # noqa: E402


def to_host(tree):
    rep = jax.jit(
        lambda t: t,
        out_shardings=jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
    )(tree)
    return jax.device_get(rep)

spec = load_spec(f"{workdir}/tiny.cfg")
host_params = to_host(r2["state"].params)
host_stats = to_host(r2["state"].batch_stats)
if pid == 0:
    W.save_weights(spec, host_params, host_stats,
                   f"{workdir}/final.weights", seen=res["resume_seen"])

# ---- standalone eval of the FINAL state under the multi-host mesh --------
# the parent re-evaluates final.weights single-process and asserts metric
# equality — multi-host eval must be a pure execution detail
from singleshotpose_tpu.drivers import run_validation  # noqa: E402

for transfer in ("bank", "rgb"):
    s = run_validation(f"{workdir}/synth.data", spec,
                       params=r2["state"].params,
                       batch_stats=r2["state"].batch_stats,
                       batch_size=4, num_workers=0, compute_dtype=None,
                       transfer=transfer, mesh=mesh, verbose=False)
    res[f"final_eval_err2d_{transfer}"] = float(s["mean_err_2d"])
    res[f"final_eval_n_{transfer}"] = int(s["n_samples"])

# ---- multi-object trainer: 1 epoch over the same global mesh ----
import singleshotpose_tpu.data.synth_multi as sm  # noqa: E402

sm.ADD_OBJS = dict(sm.ADD_OBJS)
sm.ADD_OBJS["ape"] = ()
rcm = TrainRunConfig(eval_every=100, eval_after=100, num_workers=0,
                     bg_dir="/nonexistent", log_every=100,
                     max_epochs_override=1, mesh=mesh,
                     orbax_dir=f"{workdir}/orbax_multi",
                     orbax_every_epochs=1)
rcm.compute_dtype = None
rm = run_training_multi(f"{workdir}/occ.data", f"{workdir}/multi.cfg",
                        None, 0, None, f"{workdir}/LINEMOD", rcm)
res["multi_losses"] = [float(x) for x in rm["history"]["training_losses"]]
res["multi_seen"] = int(jax.device_get(rm["state"].seen))
res["multi_fp"] = fingerprint(rm["state"].params)

with open(f"{workdir}/result_{pid}.json", "w") as f:
    json.dump(res, f)
print(f"WORKER_{pid}_OK")
