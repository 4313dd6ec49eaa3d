#!/usr/bin/env python
"""Benchmark the Pallas fused modulated-instance-norm vs the XLA formulation.

  python scripts/bench_pallas.py [--shape B H W C]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", type=int, nargs=4, default=(4, 256, 256, 512))
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepsee_tpu.ops.norms import instance_norm_2d
    from deepsee_tpu.ops.pallas.modnorm import modulated_instance_norm

    b, h, w, c = args.shape
    dtype = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c), dtype)
    scale = jnp.asarray(rng.randn(b, h, w, c), dtype)
    offset = jnp.asarray(rng.randn(b, h, w, c), dtype)

    @jax.jit
    def xla_version(x, s, o):
        return jnp.sum(instance_norm_2d(x) * s + o)

    @jax.jit
    def pallas_version(x, s, o):
        return jnp.sum(modulated_instance_norm(x, s, o))

    results = {}
    for name, fn in (("xla", xla_version), ("pallas", pallas_version)):
        v = float(fn(x, scale, offset))
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(fn(x, scale, offset))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        gb = 4 * b * h * w * c * dtype.itemsize / 2**30  # 3 reads + 1 write
        results[name] = med
        print(f"{name:7s}: {med * 1e3:8.2f} ms   {gb / med:6.1f} GB/s   "
              f"(check {v:.3f})")
    print(f"pallas/xla speedup: {results['xla'] / results['pallas']:.2f}x")


if __name__ == "__main__":
    main()
