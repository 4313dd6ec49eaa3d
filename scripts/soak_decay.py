#!/usr/bin/env python
"""On-device long-horizon soak: train a REAL preset across the
niter->niter_decay boundary on the TPU, with a mid-run stop + resume.

The CPU-mesh version of this lives in tests/test_soak_resume.py (tiny
config); this script executes the same lifecycle — periodic hooks, crash
save, --continue_train, per-epoch TTUR linear decay to zero
(options/train_options.py:31-34, managers/trainer_manager.py:76-96) — at a
real preset's sizes on the chip, and prints one JSON line of evidence.

  python scripts/soak_decay.py --name 8x_independent_128x128 \
      --batch_size 8 --niter 2 --niter_decay 2 [--remat]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="8x_independent_128x128")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--niter", type=int, default=2)
    p.add_argument("--niter_decay", type=int, default=2)
    p.add_argument("--steps_per_epoch", type=int, default=8)
    p.add_argument("--stop_after", type=int, default=12,
                   help="steps before the simulated kill (mid-epoch-2)")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--out_dir", default="")
    args = p.parse_args()

    import jax

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.data import DataLoader, SyntheticDataset
    from deepsee_tpu.train import loop as loop_mod
    from deepsee_tpu.train.loop import Trainer
    from deepsee_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="deepsee_soak_")
    exp = get_preset(args.name).replace(checkpoints_dir=out_dir)
    bs = args.batch_size
    spe = args.steps_per_epoch
    exp = exp.replace(train=dataclasses.replace(
        exp.train, niter=args.niter, niter_decay=args.niter_decay,
        batch_size=bs, remat=args.remat,
        print_freq=bs * 2, display_freq=bs * spe // 2,
        save_latest_freq=bs * spe // 2, evaluation_freq=bs * spe,
        num_evaluation_samples=bs))
    run_dir = os.path.join(out_dir, exp.name)
    total_epochs = args.niter + args.niter_decay

    def loader():
        ds = SyntheticDataset(exp, length=bs * spe)
        return DataLoader(ds, bs, shuffle=False, drop_last=True,
                          num_workers=1, prefetch=0)

    backend = jax.default_backend()
    print(f"[soak] backend={backend} run_dir={run_dir}", flush=True)

    # ---- phase 1: run then stop mid-epoch (the finally crash-save fires)
    t0 = time.time()
    t1 = Trainer(exp)
    state = t1.run(loader(), max_steps=args.stop_after)
    phase1_s = time.time() - t0
    assert int(state.step) == args.stop_after, int(state.step)
    assert os.path.exists(os.path.join(run_dir, "iter.txt"))
    assert os.path.exists(os.path.join(run_dir, "orbax", "latest.txt"))
    print(f"[soak] phase 1: {args.stop_after} steps in {phase1_s:.0f}s, "
          "killed mid-run; crash-save artifacts present", flush=True)

    # ---- phase 2: resume, spy on per-epoch lr application, run to the end
    applied = []
    real_set = loop_mod.set_epoch_lr

    def spy(state, exp_, epoch):
        out = real_set(state, exp_, epoch)
        applied.append((epoch, float(out.opt_g.hyperparams["lr"]),
                        float(out.opt_d.hyperparams["lr"])))
        return out

    loop_mod.set_epoch_lr = spy
    t0 = time.time()
    t2 = Trainer(exp, continue_train=True)
    assert int(t2.state.step) == args.stop_after, "restore lost the step"
    final = t2.run(loader())
    phase2_s = time.time() - t0
    loop_mod.set_epoch_lr = real_set

    # resumed at the recorded epoch and decayed linearly to zero
    resume_epoch = applied[0][0]
    assert resume_epoch > 1, f"resume restarted at epoch {resume_epoch}"
    assert [e for e, _, _ in applied] == list(
        range(resume_epoch, total_epochs + 1)), applied
    g_lr, d_lr = exp.train.g_lr(), exp.train.d_lr()
    lr_table = []
    for epoch, g, d in applied:
        scale = exp.train.epoch_lr_scale(epoch)
        np.testing.assert_allclose(g, g_lr * scale, rtol=1e-6)
        np.testing.assert_allclose(d, d_lr * scale, rtol=1e-6)
        lr_table.append({"epoch": epoch, "g_lr": g, "d_lr": d,
                         "scale": scale})
    assert lr_table[-1]["scale"] == 0.0, "decay never reached zero"

    # finite through the lr->0 endgame
    for tree in (final.g_vars, final.d_vars):
        for leaf in jax.tree_util.tree_leaves(tree):
            assert np.isfinite(np.asarray(leaf)).all(), "non-finite params"

    # hooks fired across the boundary
    for f in ("fid_iter.txt", "metrics_iter.txt", "loss_log.txt"):
        assert os.path.exists(os.path.join(run_dir, f)), f
    web = os.path.join(run_dir, "web", "images")
    assert os.path.isdir(web) and os.listdir(web), "display hook never fired"
    vals = np.loadtxt(os.path.join(run_dir, "iter.txt"), delimiter=",")
    assert int(vals[0]) == total_epochs, vals

    print(json.dumps({
        "metric": "soak_decay_resume",
        "config": args.name, "backend": backend,
        "batch": bs, "steps_per_epoch": spe,
        "epochs": total_epochs, "niter": args.niter,
        "final_step": int(final.step),
        "stop_after": args.stop_after, "resume_epoch": resume_epoch,
        "lr_schedule_applied": lr_table,
        "phase1_s": round(phase1_s, 1), "phase2_s": round(phase2_s, 1),
        "ok": True,
    }))


if __name__ == "__main__":
    main()
