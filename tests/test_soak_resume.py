"""Long-horizon soak: train ACROSS the niter->niter_decay boundary with a
mid-run stop + --continue_train resume, all periodic hooks firing.

The reference trains 50+25 epochs with linear TTUR lr decay after epoch
`niter` (options/train_options.py:31-34, managers/trainer_manager.py:76-96)
and resumes epoch/iter state from iter.txt (util/iter_counter.py:30-47).
This is the only major code path no short run crosses: the
set_epoch_lr + IterationCounter-resume interplay.  Asserts:

  * the resumed run continues at the recorded epoch (NOT epoch 1 — a real
    bug this test caught: Trainer.run didn't pass continue_train to
    IterationCounter, so every resume silently re-applied the undecayed lr)
  * the decayed lr is actually applied after resume, linearly to zero
  * losses/params stay finite through the lr->0 endgame
  * save / display / eval hooks fire across the boundary (fid_iter.txt,
    metrics_iter.txt, web visuals, epoch-tagged checkpoints)
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.data import DataLoader, SyntheticDataset

pytestmark = pytest.mark.slow  # two fused-step compiles + an eval sweep


def _make_exp(tmp):
    exp = tiny_test_experiment().replace(checkpoints_dir=str(tmp))
    # 4 epochs x 4 steps x batch 2 = 32 samples; decay starts after epoch 2.
    # Freqs in samples: print every 8, display/save/eval every 16.
    return exp.replace(train=dataclasses.replace(
        exp.train, niter=2, niter_decay=2, batch_size=2,
        print_freq=8, display_freq=16, save_latest_freq=16,
        evaluation_freq=16, num_evaluation_samples=4))


def _loader(exp):
    ds = SyntheticDataset(exp, length=8)
    return DataLoader(ds, exp.train.batch_size, shuffle=False,
                      drop_last=True, num_workers=1, prefetch=0)


def test_soak_across_decay_boundary_with_resume(tmp_path, monkeypatch):
    from deepsee_tpu.train import loop as loop_mod
    from deepsee_tpu.train.loop import Trainer

    exp = _make_exp(tmp_path)
    run_dir = os.path.join(str(tmp_path), exp.name)

    # phase 1: stop mid-epoch 2 (still pre-decay); the finally block
    # crash-saves 'latest' and iter.txt exactly as a kill would
    t1 = Trainer(exp)
    state = t1.run(_loader(exp), max_steps=5)
    assert int(state.step) == 5
    assert os.path.exists(os.path.join(run_dir, "iter.txt"))
    assert os.path.exists(os.path.join(run_dir, "orbax", "latest.txt"))

    # phase 2: resume and run through the boundary to the end,
    # spying on every per-epoch lr application
    applied = []
    real_set = loop_mod.set_epoch_lr

    def spy(state, exp_, epoch):
        out = real_set(state, exp_, epoch)
        applied.append((epoch, float(out.opt_g.hyperparams["lr"]),
                        float(out.opt_d.hyperparams["lr"])))
        return out

    monkeypatch.setattr(loop_mod, "set_epoch_lr", spy)

    t2 = Trainer(exp, continue_train=True)
    assert int(t2.state.step) == 5, "checkpoint restore lost the step"
    final = t2.run(_loader(exp))

    # resumed at epoch 2 (not 1!) and crossed the decay boundary:
    # scale 1.0 at epoch 2, (4-3)/2=0.5 at 3, (4-4)/2=0.0 at 4
    assert [e for e, _, _ in applied] == [2, 3, 4], applied
    g_lr, d_lr = exp.train.g_lr(), exp.train.d_lr()
    for (epoch, g, d), scale in zip(applied, [1.0, 0.5, 0.0]):
        np.testing.assert_allclose(g, g_lr * scale, rtol=1e-6,
                                   err_msg=f"G lr at epoch {epoch}")
        np.testing.assert_allclose(d, d_lr * scale, rtol=1e-6,
                                   err_msg=f"D lr at epoch {epoch}")

    # full horizon completed: 5 steps + resumed epochs 2,3,4 x 4 steps
    assert int(final.step) == 17, int(final.step)

    # params stayed finite through the lr->0 endgame
    for tree in (final.g_vars, final.d_vars):
        for leaf in jax.tree_util.tree_leaves(tree):
            assert np.isfinite(np.asarray(leaf)).all(), "non-finite params"

    # hooks fired across the boundary
    assert os.path.exists(os.path.join(run_dir, "fid_iter.txt"))
    assert os.path.exists(os.path.join(run_dir, "metrics_iter.txt"))
    assert os.path.exists(os.path.join(run_dir, "loss_log.txt"))
    web = os.path.join(run_dir, "web", "images")
    assert os.path.isdir(web) and os.listdir(web), "display hook never fired"
    # epoch-tagged checkpoints from save_epoch_freq=1
    tags = [f for f in os.listdir(os.path.join(run_dir, "orbax"))
            if f.startswith("epoch_")]
    assert tags, "no epoch-tagged checkpoints"

    # iter.txt now records the final epoch — a further resume would be a
    # no-op continuation, not a restart
    vals = np.loadtxt(os.path.join(run_dir, "iter.txt"), delimiter=",")
    assert int(vals[0]) == 4
