#!/usr/bin/env python
"""int8-vs-bf16 output parity on TRAINED weights (VERDICT r2 item 3).

Round 2 validated the W8A8 path only against random-init weights — the
friendliest case for per-tensor activation scales.  This loads a trained
Orbax checkpoint, generates the same batch under bf16 and under
`int8_inference`, and reports PSNR / mean|d| / max|d| between the two
outputs, plus PSNR-vs-GT for each mode (the serving question: how much
reconstruction quality does int8 give up?).

  python scripts/int8_accuracy.py --name 8x_independent_256x256 \\
      --checkpoints_dir /root/ckpt_r3 --batch 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 2.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float(10.0 * np.log10(peak * peak / max(mse, 1e-12)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="8x_independent_256x256")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--no_smooth", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.data import SyntheticDataset
    from deepsee_tpu.models.layers import int8_inference
    from deepsee_tpu.system import SRSystem
    from deepsee_tpu.utils.checkpoint import load_inference_variables

    exp = get_preset(args.name).replace(is_train=False,
                                        checkpoints_dir=args.checkpoints_dir)
    system = SRSystem(exp)
    cfg = exp.model

    variables, step = load_inference_variables(exp, with_step=True)

    ds = SyntheticDataset(exp, length=args.batch, seed=args.seed)
    samples = [ds[i] for i in range(args.batch)]
    batch = {
        "image_hr": jnp.asarray(np.stack([s["image_hr"] for s in samples])),
        "label": jnp.asarray(np.stack([s["label"] for s in samples])),
    }
    if cfg.guiding_style_image:
        batch["guiding_image"] = jnp.asarray(
            np.stack([s["guiding_image"] for s in samples]))
        batch["guiding_label"] = jnp.asarray(
            np.stack([s["guiding_label"] for s in samples]))

    def infer(g, e, batch):
        pre = system.preprocess(batch)
        fake, _, _ = system.generate(g, e, pre,
                                     use_full=cfg.guiding_style_image,
                                     no_noise=True, train=False)
        return fake

    bf16 = np.asarray(jax.device_get(
        jax.jit(infer)(variables.g, variables.e, batch)))
    with int8_inference(smooth=not args.no_smooth):
        q = np.asarray(jax.device_get(
            jax.jit(infer)(variables.g, variables.e, batch)))
    gt = np.asarray(jax.device_get(batch["image_hr"]))

    print(json.dumps({
        "config": args.name, "checkpoint_step": step, "batch": args.batch,
        "smooth": not args.no_smooth,
        "int8_vs_bf16": {
            "psnr_db": round(psnr(q, bf16), 2),
            "mean_abs_diff": round(float(np.mean(np.abs(q - bf16))), 5),
            "max_abs_diff": round(float(np.max(np.abs(q - bf16))), 4),
        },
        "vs_ground_truth": {
            "psnr_bf16_db": round(psnr(bf16, gt), 2),
            "psnr_int8_db": round(psnr(q, gt), 2),
        },
        "weights": "trained_checkpoint",
    }))


if __name__ == "__main__":
    main()
