#!/usr/bin/env python
"""Training-step throughput benchmark (secondary to bench.py).

Runs the fused GAN step (G update + D update, preprocessing included) on the
8x 256^2 config with synthetic data and reports img/s and step latency.

  python scripts/bench_train.py [--batch 4] [--preset 8x_independent_256x256]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="8x_independent_256x256")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.system import SRSystem
    from deepsee_tpu.train import create_train_state, make_train_step

    exp = get_preset(args.preset)
    exp = exp.replace(train=dataclasses.replace(
        exp.train, batch_size=args.batch, remat=args.remat))
    system = SRSystem(exp)
    state = create_train_state(system, jax.random.PRNGKey(0))
    step = make_train_step(system, donate=True)

    cfg = exp.model
    rng = np.random.RandomState(0)
    batch = {
        "image_hr": jnp.asarray(
            np.tanh(rng.randn(args.batch, cfg.crop_size, cfg.crop_size, 3)),
            jnp.float32),
        "label": jnp.asarray(
            rng.randint(0, cfg.label_nc,
                        (args.batch, cfg.crop_size, cfg.crop_size)),
            jnp.int32),
    }

    def once(state):
        state, logs = step(state, batch)
        # force execution: fetch one loss scalar
        _ = float(logs["D_Fake"])
        return state

    state = once(state)  # compile
    state = once(state)
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state = once(state)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(json.dumps({
        "metric": f"train_step_{cfg.crop_size}px",
        "batch": args.batch,
        "step_ms": round(med * 1000, 1),
        "img_per_sec": round(args.batch / med, 2),
    }))


if __name__ == "__main__":
    main()
