#!/usr/bin/env python
"""Train-step throughput/MFU benchmark (run on the real TPU).

  python scripts/bench_train.py --name 8x_independent_256x256 \\
      --batch_size 16 --remat --remat_policy convs --steps 6

Prints one JSON line: ms/step, img/s, and when XLA cost analysis is
available, executed TFLOP/step and hardware FLOP utilization vs bf16 peak.
Timing uses a fetched scalar per step (the axon platform's
block_until_ready returns early; a data-dependent fetch is the only sync).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="8x_independent_256x256")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat_policy", default="full",
                   choices=("full", "convs"))
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--reuse_fake", action="store_true",
                   help="single-forward GAN schedule (opt-in deviation)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.system import SRSystem
    from deepsee_tpu.train.state import create_train_state
    from deepsee_tpu.train.steps import make_train_step

    exp = get_preset(args.name)
    exp = exp.replace(train=dataclasses.replace(
        exp.train, batch_size=args.batch_size, remat=args.remat,
        remat_policy=args.remat_policy, reuse_fake=args.reuse_fake))
    cfg = exp.model
    system = SRSystem(exp)
    state = create_train_state(system, jax.random.PRNGKey(0))
    step = make_train_step(system, donate=True)

    rng = np.random.RandomState(0)
    b = args.batch_size
    batch = {
        "image_hr": jnp.asarray(
            np.tanh(rng.randn(b, cfg.crop_size, cfg.crop_size, 3)),
            jnp.float32),
        "label": jnp.asarray(
            rng.randint(0, cfg.label_nc, (b, cfg.crop_size, cfg.crop_size)),
            jnp.int32),
    }
    if cfg.guiding_style_image:
        batch["guiding_image"] = batch["image_hr"]
        batch["guiding_label"] = batch["label"]

    flops = None
    mem = {}
    run = step
    t0 = time.perf_counter()
    try:  # AOT-compile once; the executable serves BOTH the cost/memory
        # analysis and the timed loop (jit dispatch would compile the same
        # program a second time through the slow tunnel)
        compiled = step.lower(state, batch).compile()
        run = compiled
        cost = compiled.cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(c.get("flops", 0.0)) or None
            ba = float(c.get("bytes accessed", 0.0))
            if ba:
                mem["hbm_traffic_gb"] = round(ba / 1e9, 1)
            # (cost_analysis also has "optimal_seconds", but it returns
            # negative garbage on this backend — not emitted)
        # planned HBM (device memory_stats is unavailable through the
        # tunnel): temp = activations/workspace, args = params+moments+batch
        ma = compiled.memory_analysis()
        if ma is not None:
            mem.update(
                hbm_temp_gib=round(ma.temp_size_in_bytes / 2**30, 3),
                hbm_args_gib=round(ma.argument_size_in_bytes / 2**30, 3),
                hbm_out_gib=round(ma.output_size_in_bytes / 2**30, 3),
            )
    except Exception as e:  # noqa: BLE001
        print(f"# AOT compile / cost analysis unavailable: {e}")

    state, logs = run(state, batch)
    _sync = float(jax.device_get(logs["D_real"]))
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        state, logs = run(state, batch)
        _sync = float(jax.device_get(logs["D_real"]))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) * 1000.0

    out = {
        "config": args.name, "batch": b,
        "remat": args.remat, "remat_policy": args.remat_policy,
        "ms_per_step": round(ms, 1),
        "img_per_s": round(b / (ms / 1000.0), 2),
        "compile_s": round(compile_s, 1),
    }
    if flops:
        tflops_per_step = flops / 1e12
        out["executed_tflop_per_step"] = round(tflops_per_step, 2)
        out["hw_flop_utilization"] = round(
            tflops_per_step / (ms / 1000.0) / V5E_BF16_PEAK_TFLOPS, 3)
    if mem.get("hbm_traffic_gb"):
        # roofline position: fraction of v5e's 819 GB/s the step sustains.
        # UPPER BOUND: XLA cost_analysis 'bytes accessed' counts per-op
        # logical bytes incl. fusion-internal traffic that never reaches
        # HBM, so this can overstate the truly sustained fraction (>1.0 is
        # possible on heavily fused programs).
        out["hbm_bw_utilization_xla_bytes_ub"] = round(
            mem["hbm_traffic_gb"] / (ms / 1000.0) / 819.0, 3)
    out.update(mem)
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and stats.get("peak_bytes_in_use"):
            out["peak_hbm_gib"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    except Exception:  # noqa: BLE001
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
