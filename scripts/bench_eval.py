#!/usr/bin/env python
"""Measure the on-chip evaluation sweep end to end — the InferenceManager
equivalent (managers/inference_manager.py:61-147): jitted generate + all
per-sample metrics (PSNR/SSIM/MS-SSIM/RMSE[/LPIPS]) + both InceptionV3
pool3 activation sets per batch, then the host-side Frechet sqrtm.

Exists to replace ARCHITECTURE.md's former "~220 img/s" ESTIMATE for the
eval sweep with a measurement (everything else in that section is driver- or
chip-measured; this was the one unmeasured number).

  python scripts/bench_eval.py --name 8x_independent_256x256 \
      --batch 16 --num_samples 128

One JSON line: end-to-end eval img/s (loader + device sweep + per-batch
metric fetch + FID sqrtm), the device-sweep-only rate, and the sqrtm share.
Synthetic samples isolate the sweep from disk decode (bench_loader.py and
scripts/train_from_disk.py cover the host decode side).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="8x_independent_256x256")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--num_samples", type=int, default=128)
    ap.add_argument("--platform", default="", help="e.g. cpu to smoke-test")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import dataclasses

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.data import DataLoader, SyntheticDataset
    from deepsee_tpu.eval import fid as fid_mod
    from deepsee_tpu.eval.evaluator import InferenceEvaluator
    from deepsee_tpu.system import SRSystem
    from deepsee_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    if args.name == "tiny_test":  # CPU smoke-test escape
        from deepsee_tpu.config import tiny_test_experiment
        exp = tiny_test_experiment()
    else:
        exp = get_preset(args.name)
    exp = exp.replace(is_train=False, train=dataclasses.replace(
        exp.train, batch_size=args.batch))
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    evaluator = InferenceEvaluator(system, args.num_samples)

    def make_loader():
        ds = SyntheticDataset(exp, length=args.num_samples)
        return DataLoader(ds, args.batch, shuffle=False, drop_last=False,
                          num_workers=2, prefetch=2)

    backend = jax.default_backend()
    print(f"[bench_eval] backend={backend} {args.name} batch={args.batch} "
          f"num_samples={args.num_samples}", flush=True)

    r0 = evaluator.run(variables, make_loader())  # compile + warmup
    print(f"[bench_eval] warmup (compile) sweep: "
          f"{r0['eval_seconds']:.1f}s FID={r0.get('FID', float('nan')):.2f}",
          flush=True)
    results = [evaluator.run(variables, make_loader()) for _ in range(3)]
    eval_s = float(np.median([r["eval_seconds"] for r in results]))

    # device-sweep-only rate: re-run the jitted infer+metrics over resident
    # device batches (no loader, no per-batch host fetch except the last) —
    # bounds how much of the end-to-end gap is host-side
    rng = np.random.RandomState(0)
    cfg = exp.model
    import jax.numpy as jnp
    device_batch = {
        "image_hr": jnp.asarray(np.tanh(rng.randn(
            args.batch, cfg.crop_size, cfg.crop_size, 3)), jnp.float32),
        "label": jnp.asarray(rng.randint(
            0, cfg.label_nc, (args.batch, cfg.crop_size, cfg.crop_size)),
            jnp.int32),
    }
    if cfg.guiding_style_image:
        device_batch["guiding_image"] = device_batch["image_hr"]
        device_batch["guiding_label"] = device_batch["label"]
    n_batches = -(-args.num_samples // args.batch)

    def device_sweep():
        # the fused program `run` actually dispatches (infer + metrics +
        # Inception activations in one compiled call)
        t0 = time.perf_counter()
        m = None
        for _ in range(n_batches):
            m = evaluator._sweep(variables.g, variables.e, device_batch)
        jax.device_get(m)  # sync the tail
        return time.perf_counter() - t0

    device_sweep()  # warm
    device_s = float(np.median([device_sweep() for _ in range(3)]))

    # host Frechet share (trace-of-sqrtm on the 2048x2048 covariance pair,
    # fid.py frechet_distance — the fast symmetric-eig path by default)
    acts = np.asarray(rng.randn(args.num_samples, fid_mod.POOL3_DIM),
                      np.float32)
    t0 = time.perf_counter()
    fid_mod.fid_from_activations(acts, acts + 0.1)
    sqrtm_s = time.perf_counter() - t0

    out = {
        "metric": f"eval_sweep_{args.name}_b{args.batch}",
        "value": round(args.num_samples / eval_s, 1),
        "unit": "img/s end-to-end",
        "backend": backend,
        "num_samples": args.num_samples,
        "eval_seconds": round(eval_s, 2),
        "device_sweep_img_per_s": round(args.num_samples / device_s, 1),
        "fid_sqrtm_seconds": round(sqrtm_s, 2),
        "fid_sqrtm_share": round(sqrtm_s / eval_s, 3),
        "fid_exact_weights": bool(evaluator.fid_exact),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
