"""Multi-host side-effect hygiene + the jitted display path.

The reference is single-host and writes run-directory artifacts
unconditionally (train.py:49-105, util/visualizer.py, util/iter_counter.py).
Under multi-host JAX every process would duplicate those writes and collide
on shared storage; all run-dir writers are guarded with
`utils.files.is_main_process()` (jax.process_index()==0).  These tests
monkeypatch process_index to simulate a non-zero host and assert NOTHING is
written — and that process 0 behaves exactly as before.

Also covers VERDICT r2 item 2: Trainer._display must use the jitted
generate path (one compile, no per-call trace) and produce the same visuals
as the eager path.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.data import DataLoader, SyntheticDataset


def _patch_process_index(monkeypatch, idx: int, count: int = 2):
    monkeypatch.setattr(jax, "process_index", lambda backend=None: idx)
    monkeypatch.setattr(jax, "process_count", lambda backend=None: count)


def _listdir_deep(root):
    out = []
    for r, _, files in os.walk(root):
        for f in files:
            out.append(os.path.relpath(os.path.join(r, f), root))
    return sorted(out)


def test_visualizer_silent_on_secondary_host(tmp_path, monkeypatch):
    from deepsee_tpu.utils.visualizer import Visualizer

    _patch_process_index(monkeypatch, 1)
    exp = tiny_test_experiment().replace(checkpoints_dir=str(tmp_path))
    vis = Visualizer(exp)
    vis.print_current_errors(1, 1, {"GAN": 0.5}, 0.1)
    vis.display_current_results(
        {"synthesized_image": np.zeros((8, 8, 3), np.float32)}, 1, 1)
    assert _listdir_deep(str(tmp_path)) == []


def test_iter_counter_silent_on_secondary_host(tmp_path, monkeypatch):
    from deepsee_tpu.utils.iter_counter import IterationCounter

    _patch_process_index(monkeypatch, 1)
    exp = tiny_test_experiment().replace(checkpoints_dir=str(tmp_path))
    counter = IterationCounter(exp, dataset_size=8)
    counter.record_epoch_start(1)
    counter.record_one_iteration()
    counter.record_current_iter()
    counter.record_fid(123.0, "train", 4)
    counter.record_metrics({"psnr": 30.0}, "train", 4)
    counter.append_eval_history("fid_iter.txt", 1.0)
    # trigger logic still functions on every host (the loop needs it)
    assert isinstance(counter.needs_printing(), (bool, np.bool_))
    assert _listdir_deep(str(tmp_path)) == []


def test_iter_counter_writes_on_main_host(tmp_path, monkeypatch):
    from deepsee_tpu.utils.iter_counter import IterationCounter

    _patch_process_index(monkeypatch, 0)
    exp = tiny_test_experiment().replace(checkpoints_dir=str(tmp_path))
    counter = IterationCounter(exp, dataset_size=8)
    counter.record_epoch_start(1)
    counter.record_one_iteration()
    counter.record_current_iter()
    counter.record_fid(123.0, "train", 4)
    run_dir = os.path.join(str(tmp_path), exp.name)
    assert os.path.exists(os.path.join(run_dir, "iter.txt"))
    assert os.path.exists(os.path.join(run_dir, "fid_iter.txt"))


def test_checkpoint_manager_config_guarded(tmp_path, monkeypatch):
    """Orbax still runs on every process; config.json/tag files do not.
    (Patch is_main_process, not process_count — a patched process_count
    makes single-process Orbax demand a distributed client.)"""
    import deepsee_tpu.utils.checkpoint as ckpt_mod
    from deepsee_tpu.utils.checkpoint import CheckpointManager

    monkeypatch.setattr(ckpt_mod, "is_main_process", lambda: False)
    exp = tiny_test_experiment().replace(checkpoints_dir=str(tmp_path))
    CheckpointManager(exp)
    run_dir = os.path.join(str(tmp_path), exp.name)
    assert not os.path.exists(os.path.join(run_dir, "config.json"))
    # the orbax dir itself exists (every process participates in saves)
    assert os.path.isdir(os.path.join(run_dir, "orbax"))


def test_checkpoint_manager_init_preserves_config(tmp_path):
    """Restore-only consumers (demo, evaluate, int8_accuracy) construct a
    CheckpointManager from a CLI-reconstructed config; __init__ must not
    overwrite the trained run's recorded config.json — only save() writes
    the snapshot."""
    from deepsee_tpu.utils.checkpoint import CheckpointManager

    exp = tiny_test_experiment().replace(checkpoints_dir=str(tmp_path))
    run_dir = os.path.join(str(tmp_path), exp.name)
    os.makedirs(run_dir)
    truth = '{"ground": "truth"}'
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        f.write(truth)
    CheckpointManager(exp)
    with open(os.path.join(run_dir, "config.json")) as f:
        assert f.read() == truth


def test_copy_src_guard(monkeypatch, tmp_path):
    """Trainer's copy_src call is inside an is_main_process() guard."""
    import deepsee_tpu.utils.files as files_mod

    _patch_process_index(monkeypatch, 1)
    assert not files_mod.is_main_process()
    _patch_process_index(monkeypatch, 0)
    assert files_mod.is_main_process()


def test_evaluator_aggregates_across_hosts(monkeypatch):
    """Sharded eval loaders give each host a 1/N stripe; run() must gather
    every host's per-sample metrics before aggregating, so the recorded
    mean/std (and FID activations) cover the full num_samples.  Simulates
    host 1 by faking the all-gather."""
    import deepsee_tpu.eval.evaluator as ev_mod
    from deepsee_tpu.data import DataLoader, SyntheticDataset
    from deepsee_tpu.eval.evaluator import InferenceEvaluator
    from deepsee_tpu.system import SRSystem

    exp = tiny_test_experiment().replace(is_train=False)
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    ds = SyntheticDataset(exp, length=8)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                        num_workers=1, prefetch=0)

    ev = InferenceEvaluator(system, num_samples=8, compute_fid=False,
                            compute_lpips=False)
    single = ev.run(variables, loader)
    assert single["n_samples"] == 8

    # now pretend to be host 0 of 2: local sweep stops at ceil(8/2)=4
    # samples, and the gather contributes host 1's stripe (known values)
    monkeypatch.setattr(jax, "process_count", lambda backend=None: 2)
    calls = {}

    def fake_gather(tree):
        calls["tree"] = tree
        # host 1: same shapes, all-constant metric rows, last row invalid
        other = {k: np.full_like(v, 7.0) for k, v in tree.items()}
        other["_valid"] = np.array([1.0, 1.0, 1.0, 0.0], np.float32)
        return {k: np.concatenate([tree[k], other[k]], 0) for k in tree}

    monkeypatch.setattr(ev_mod, "_gather_across_hosts", fake_gather)
    merged = ev.run(variables, iter(DataLoader(
        ds, batch_size=2, shuffle=False, drop_last=True, num_workers=1,
        prefetch=0)))

    assert calls["tree"]["psnr"].shape == (4,)  # padded to local_target
    assert (calls["tree"]["_valid"] == 1.0).all()  # 4 real local samples
    # 4 local + 3 valid fake-host rows
    assert merged["n_samples"] == 7
    local_psnr = calls["tree"]["psnr"]
    expect = np.concatenate([local_psnr, [7.0, 7.0, 7.0]]).mean()
    np.testing.assert_allclose(merged["psnr/mean"], expect, rtol=1e-6)


def test_display_uses_jit_and_matches_eager(tmp_path):
    """VERDICT r2 item 2: _display goes through generate_jit (cache_size
    stays at 1 across repeated calls) and its visuals equal the eager
    generate() output."""
    from deepsee_tpu.train.loop import Trainer
    from deepsee_tpu.utils.visualizer import Visualizer

    exp = tiny_test_experiment().replace(checkpoints_dir=str(tmp_path))
    exp = exp.replace(train=dataclasses.replace(
        exp.train, niter=1, niter_decay=0))
    trainer = Trainer(exp)

    ds = SyntheticDataset(exp, length=2)
    loader = DataLoader(ds, exp.train.batch_size, shuffle=False,
                        drop_last=True, num_workers=1, prefetch=0)
    batch = next(iter(loader))
    device_batch = trainer._device_batch(batch)

    captured = {}

    class CaptureVis(Visualizer):
        def display_current_results(self, visuals, epoch, step):
            captured.update(visuals)

    vis = CaptureVis(exp)
    trainer._display(vis, device_batch, epoch=1, step=0)
    n_traces = trainer.system.generate_jit._cache_size()
    assert n_traces == 1
    trainer._display(vis, device_batch, epoch=1, step=1)
    assert trainer.system.generate_jit._cache_size() == 1  # no re-trace

    # eager reference path (what _display used to run)
    pre = trainer.system.preprocess(device_batch)
    fake, _, _ = trainer.system.generate(
        trainer.state.g_vars, trainer.state.e_vars, pre,
        use_full=trainer.system.cfg.full_style_image, no_noise=True,
        train=False)
    np.testing.assert_allclose(
        captured["synthesized_image"],
        np.asarray(jax.device_get(fake[0])), atol=2e-5)
    for key in ("input_label", "image_lr", "real_image"):
        assert key in captured


def test_display_full_image_under_spatial_mesh(tmp_path):
    """Under --partition spatial every activation is H-sharded; _display
    must still save the FULL image, not a 1/model_axis stripe (a plain
    addressable_shards[0] fetch returns quarter-height crops)."""
    from deepsee_tpu.config import MeshConfig
    from deepsee_tpu.train.loop import Trainer
    from deepsee_tpu.utils.visualizer import Visualizer

    exp = tiny_test_experiment().replace(checkpoints_dir=str(tmp_path))
    exp = exp.replace(
        train=dataclasses.replace(exp.train, niter=1, niter_decay=0,
                                  batch_size=2),
        mesh=MeshConfig(2, 4, "spatial"))
    trainer = Trainer(exp)

    ds = SyntheticDataset(exp, length=2)
    loader = DataLoader(ds, exp.train.batch_size, shuffle=False,
                        drop_last=True, num_workers=1, prefetch=0)
    device_batch = trainer._device_batch(next(iter(loader)))

    captured = {}

    class CaptureVis(Visualizer):
        def display_current_results(self, visuals, epoch, step):
            captured.update(visuals)

    trainer._display(CaptureVis(exp), device_batch, epoch=1, step=0)
    cfg = exp.model
    assert captured["synthesized_image"].shape == (
        cfg.crop_size, cfg.crop_size, 3), captured["synthesized_image"].shape
    assert captured["real_image"].shape == (cfg.crop_size, cfg.crop_size, 3)
    assert captured["image_lr"].shape == (cfg.start_size, cfg.start_size, 3)
