#!/usr/bin/env python
"""A/B the `reuse_fake` single-forward GAN schedule against the faithful
regenerate-for-D schedule (sr_model.py:550-553).

Two matched synthetic runs — identical init, identical per-step batches,
identical PRNG stream — differing ONLY in whether the D update reuses the
G-step fake (train/steps.py:129-140).  Records the full loss trajectories
and finishes each arm with the jitted eval-metric sweep (+FID over
deterministic random-init Inception params — random but IDENTICAL across
arms, so the comparison is valid even without the pretrained file).

  python scripts/ab_reuse_fake.py --name 8x_independent_128x128 \
      --steps 500 --eval_samples 64

Prints one JSON line and writes docs/ab_reuse_fake.json.  The throughput
side is already measured (1.27x at 256^2, ARCHITECTURE.md); this script
answers the DYNAMICS question: does the one-step-stale fake change
training trajectories?
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


def run_arm(name: str, reuse_fake: bool, steps: int, eval_samples: int,
            batch_size: int):
    import jax

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.data import DataLoader, SyntheticDataset
    from deepsee_tpu.eval.evaluator import InferenceEvaluator
    from deepsee_tpu.system import SRSystem, SystemVariables
    from deepsee_tpu.train.state import create_train_state
    from deepsee_tpu.train.steps import make_train_step

    exp = get_preset(name)
    exp = exp.replace(train=dataclasses.replace(
        exp.train, batch_size=batch_size, reuse_fake=reuse_fake))
    cfg = exp.model
    system = SRSystem(exp)
    state = create_train_state(system, jax.random.PRNGKey(0))
    step = make_train_step(system, donate=True)

    # matched batch stream: deterministic synthetic samples, same order
    # in both arms (seeded loader, no augmentation randomness consumed)
    ds = SyntheticDataset(exp, length=max(64, batch_size * 8))
    loader = DataLoader(ds, batch_size, shuffle=True, drop_last=True,
                        seed=123, num_workers=2, prefetch=2)

    traj: dict = {}
    t0 = time.perf_counter()
    it = iter(loader)
    n_done = 0
    while n_done < steps:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            continue
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        state, logs = step(state, arrays)
        # fetch every step: data-dependent sync (axon block_until_ready
        # returns early; deep enqueue chains hang) + the trajectory record
        vals = jax.device_get(logs)
        for k, v in vals.items():
            traj.setdefault(k, []).append(float(v))
        n_done += 1
        if n_done % 100 == 0:
            print(f"  [{'reuse' if reuse_fake else 'faithful'}] "
                  f"step {n_done}/{steps} "
                  f"{ {k: round(v[-1], 3) for k, v in traj.items()} }",
                  flush=True)
    train_s = time.perf_counter() - t0

    ev = InferenceEvaluator(system, num_samples=eval_samples,
                            compute_fid=True, compute_lpips=False)
    eval_ds = SyntheticDataset(exp, length=eval_samples, seed=7)
    eval_loader = DataLoader(eval_ds, batch_size, shuffle=False,
                             drop_last=False, num_workers=2, prefetch=0)
    metrics = ev.run(SystemVariables(g=state.g_vars, e=state.e_vars,
                                     d=None, vgg=None), eval_loader)
    metrics = {k: float(v) for k, v in metrics.items()}
    return traj, metrics, train_s


def summarize(traj_a, traj_b, tail: int):
    """Per-loss tail statistics + a pooled-σ comparison."""
    out = {}
    for k in traj_a:
        a = np.asarray(traj_a[k][-tail:])
        b = np.asarray(traj_b[k][-tail:])
        pooled = float(np.sqrt((a.var() + b.var()) / 2)) or 1e-9
        out[k] = {
            "faithful_mean": round(float(a.mean()), 4),
            "reuse_mean": round(float(b.mean()), 4),
            "faithful_std": round(float(a.std()), 4),
            "reuse_std": round(float(b.std()), 4),
            "delta_in_pooled_sigmas": round(
                float(abs(a.mean() - b.mean()) / pooled), 3),
        }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="8x_independent_128x128")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--eval_samples", type=int, default=64)
    p.add_argument("--tail", type=int, default=100,
                   help="trailing steps for the trajectory comparison")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "ab_reuse_fake.json"))
    args = p.parse_args()

    from deepsee_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    print(f"arm A: faithful regenerate ({args.steps} steps)", flush=True)
    traj_a, eval_a, time_a = run_arm(args.name, False, args.steps,
                                     args.eval_samples, args.batch_size)
    print(f"arm B: reuse_fake ({args.steps} steps)", flush=True)
    traj_b, eval_b, time_b = run_arm(args.name, True, args.steps,
                                     args.eval_samples, args.batch_size)

    losses = summarize(traj_a, traj_b, args.tail)
    eval_delta = {
        k: {"faithful": round(eval_a[k], 4), "reuse": round(eval_b[k], 4),
            "delta": round(eval_b[k] - eval_a[k], 4)}
        for k in eval_a
        if k in eval_b and k not in ("eval_seconds",)}

    # indistinguishable = every tail loss within 1 pooled sigma AND the
    # eval sweep agrees (|dPSNR|<0.25 dB, |dSSIM|<0.01, |dFID|/FID<10%)
    loss_ok = all(v["delta_in_pooled_sigmas"] < 1.0 for v in losses.values())
    psnr_ok = abs(eval_delta.get("psnr/mean", {}).get("delta", 0.0)) < 0.25
    ssim_ok = abs(eval_delta.get("ssim/mean", {}).get("delta", 0.0)) < 0.01
    fid_a = eval_a.get("FID")
    fid_ok = (fid_a is None or fid_a == 0
              or abs(eval_delta["FID"]["delta"]) / abs(fid_a) < 0.10)
    verdict = ("indistinguishable"
               if loss_ok and psnr_ok and ssim_ok and fid_ok
               else "dynamics differ")

    result = {
        "config": args.name, "steps": args.steps,
        "batch_size": args.batch_size, "tail": args.tail,
        "losses_tail": losses, "eval": eval_delta,
        "train_seconds": {"faithful": round(time_a, 1),
                          "reuse": round(time_b, 1)},
        "verdict": verdict,
        "trajectories": {"faithful": {k: [round(x, 4) for x in v]
                                      for k, v in traj_a.items()},
                         "reuse": {k: [round(x, 4) for x in v]
                                   for k, v in traj_b.items()}},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f)
    summary = {k: v for k, v in result.items() if k != "trajectories"}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
