"""Device-memory (HBM) budget accounting shared by the HBM-resident data
banks and the in-training eval-transfer policy.

Three subsystems park multi-GB u8 corpora in device memory — the eval bank
(data/eval_bank.py), the single-object frame bank (data/device_bank.py),
and the multi-object scene bank (data/device_synth.py) — and can collide
with params/activations on a 16 GB chip mid-run.  Every consumer preflights
through :func:`check_hbm_budget` so an over-budget placement fails
immediately with an actionable message instead of an opaque device OOM
minutes into training.
"""
from typing import Optional

import jax

__all__ = ["hbm_free_bytes", "check_hbm_budget"]

# headroom kept free for parameters, activations, and XLA scratch after a
# bank placement (the largest observed live set: multi train step at batch
# 128 peaks well under this)
DEFAULT_HEADROOM = 1 << 30


def hbm_free_bytes() -> Optional[int]:
    """Device-memory headroom of the first local device, or ``None`` when
    the backend has no accounting (CPU/interpret — banks live in host RAM
    there and the budget question disappears)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return None
    if "bytes_limit" not in stats:
        return None
    return int(stats["bytes_limit"]) - int(stats.get("bytes_in_use", 0))


def check_hbm_budget(need_bytes: int, what: str,
                     headroom: int = DEFAULT_HEADROOM) -> None:
    """Raise ``RuntimeError`` if placing ``need_bytes`` would leave less
    than ``headroom`` free HBM.  No-op where accounting is unavailable."""
    free = hbm_free_bytes()
    if free is None or need_bytes + headroom <= free:
        return
    raise RuntimeError(
        f"{what} needs {need_bytes >> 20} MB device memory plus "
        f"{headroom >> 20} MB activation headroom, but only "
        f"{free >> 20} MB HBM is free. Options: evict cached eval banks "
        "(singleshotpose_tpu.data.eval_bank.clear_cache()), use a smaller "
        "split, or switch to a host loader backend "
        "(--loader_backend native / --eval_transfer rgb).")
