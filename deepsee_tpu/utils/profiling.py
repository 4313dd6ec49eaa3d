"""Profiling / tracing hooks.

Replaces the reference's ad-hoc observability (util/util.py:426-430
`gpu_info` GPUtil prints at ~20 hand-placed probe points, plus the
accidentally always-on `torch.autograd.set_detect_anomaly(True)` at
normalization.py:70) with structured JAX tooling:

  * `trace(logdir)`: context manager capturing an xprof/XLA trace viewable
    in TensorBoard or Perfetto
  * `timed(fn)`: dependency-forced wall-clock timing of a jitted step (on
    the axon platform `block_until_ready` returns early, so timings must
    anchor on a fetched scalar)
  * `device_memory_stats()`: live/peak HBM usage per device
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, iters: int = 5, warmup: int = 2,
          **kwargs) -> Dict[str, float]:
    """Median wall time of `fn(*args)`; fn must return something reducible.

    Forces a scalar fetch per call so the measurement covers real device
    execution even on platforms with asynchronous block_until_ready."""
    import jax.numpy as jnp

    def once():
        out = fn(*args, **kwargs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf))

    for _ in range(warmup):
        once()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        once()
        times.append(time.perf_counter() - t0)
    return {"median_s": float(np.median(times)),
            "min_s": float(np.min(times)),
            "max_s": float(np.max(times))}


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:  # noqa: BLE001 - not all platforms support it
            continue
        if stats:
            out[str(d)] = {
                "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 2**30,
                "peak_bytes_in_use_gb":
                    stats.get("peak_bytes_in_use", 0) / 2**30,
            }
    return out
