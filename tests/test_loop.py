"""Training loop + checkpoint round trip on the tiny config."""

import os

import numpy as np
import jax
import pytest

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.data import DataLoader, SyntheticDataset
from deepsee_tpu.train.loop import Trainer
from deepsee_tpu.utils.checkpoint import CheckpointManager


def _loader(exp, n=4):
    ds = SyntheticDataset(exp, length=n)
    return DataLoader(ds, exp.train.batch_size, shuffle=False,
                      drop_last=True, num_workers=1, prefetch=0)


def test_trainer_loop_and_resume(tmp_path):
    import dataclasses
    exp = tiny_test_experiment().replace(
        checkpoints_dir=str(tmp_path))
    exp = exp.replace(train=dataclasses.replace(
        exp.train, niter=1, niter_decay=0, print_freq=2, save_latest_freq=4,
        display_freq=4, evaluation_freq=10**9))

    trainer = Trainer(exp)
    state = trainer.run(dataloader=_loader(exp), max_steps=2)
    assert int(state.step) == 2
    k_after = np.asarray(
        jax.device_get(state.g_vars["params"]["initial"]["kernel"]))

    # crash-save happened (finally block) -> resume from checkpoint
    trainer2 = Trainer(exp, continue_train=True)
    assert int(trainer2.state.step) == 2
    k_restored = np.asarray(jax.device_get(
        trainer2.state.g_vars["params"]["initial"]["kernel"]))
    np.testing.assert_array_equal(k_restored, k_after)
    # optimizer state restored too
    assert int(trainer2.state.step) == int(state.step)

    # artifacts exist
    run_dir = os.path.join(str(tmp_path), exp.name)
    assert os.path.exists(os.path.join(run_dir, "loss_log.txt"))
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    assert os.path.exists(os.path.join(run_dir, "web", "index.html"))
    assert os.path.exists(os.path.join(run_dir, "iter.txt"))


def test_torch_export_roundtrip(tmp_path):
    """Export to the reference .pth layout and import back."""
    from deepsee_tpu.system import SRSystem
    from deepsee_tpu.utils.checkpoint import save_torch_compatible
    from deepsee_tpu.utils.torch_import import (import_torch_state,
                                                load_torch_checkpoint)

    exp = tiny_test_experiment()
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    for tag, tree in (("SR", variables.g), ("E", variables.e),
                      ("D", variables.d)):
        path = str(tmp_path / f"net_{tag}.pth")
        save_torch_compatible(tree, path)
        sd = load_torch_checkpoint(path)
        re_imported = import_torch_state(tree, sd, strict=True)
        for coll in tree:
            flat_a = jax.tree_util.tree_leaves(tree[coll])
            flat_b = jax.tree_util.tree_leaves(re_imported[coll])
            for a, b in zip(flat_a, flat_b):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
