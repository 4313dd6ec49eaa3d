"""Pretrained-weight wiring into training + the in-training FID hook
(VERDICT r1 items 1 and 3).

* create_train_state must consume TrainConfig.vgg_weights (a torchvision
  vgg19 state dict) so the perceptual loss runs on the loaded features —
  reference loss.py:105-119 always trains with pretrained VGG.
* the Trainer's evaluation trigger must compute FID (reference
  train.py:85-105, inference_manager.py:111-129) and append
  fid_iter.txt / metrics_iter.txt (util/iter_counter.py:100-121).
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.data import DataLoader, SyntheticDataset
from deepsee_tpu.system import SRSystem
from deepsee_tpu.train.loop import Trainer
from deepsee_tpu.train.state import create_train_state

from tests.test_perceptual_parity import _random_vgg19_state_dict


def test_create_train_state_loads_vgg_weights(tmp_path):
    sd = _random_vgg19_state_dict()
    path = os.path.join(str(tmp_path), "vgg19.pth")
    torch.save(sd, path)

    exp = tiny_test_experiment()
    exp = exp.replace(train=dataclasses.replace(exp.train, vgg_weights=path))
    system = SRSystem(exp)
    state = create_train_state(system, jax.random.PRNGKey(0))

    # first and last loaded convs match the file (OIHW -> HWIO)
    got0 = np.asarray(state.vgg["params"]["conv0_kernel"])
    np.testing.assert_array_equal(
        got0, sd["features.0.weight"].numpy().transpose(2, 3, 1, 0))
    # conv12 = the 13th conv = relu5_1's conv = torchvision features.28
    got12 = np.asarray(state.vgg["params"]["conv12_kernel"])
    np.testing.assert_array_equal(
        got12, sd["features.28.weight"].numpy().transpose(2, 3, 1, 0))

    # wrong-shape file fails loudly rather than training on garbage
    bad = {k: (torch.zeros(1, 1, 3, 3) if k.endswith("weight") else v)
           for k, v in sd.items()}
    bad_path = os.path.join(str(tmp_path), "bad.pth")
    torch.save(bad, bad_path)
    exp_bad = exp.replace(train=dataclasses.replace(
        exp.train, vgg_weights=bad_path))
    with pytest.raises(AssertionError):
        create_train_state(SRSystem(exp_bad), jax.random.PRNGKey(0))


@pytest.mark.slow
def test_training_eval_hook_writes_fid_history(tmp_path):
    exp = tiny_test_experiment().replace(checkpoints_dir=str(tmp_path))
    exp = exp.replace(train=dataclasses.replace(
        exp.train, niter=1, niter_decay=0, print_freq=10**9,
        save_latest_freq=10**9, display_freq=10**9,
        evaluation_freq=4,  # fires when total samples hit a multiple of 4
        num_evaluation_samples=2))

    trainer = Trainer(exp)
    ds = SyntheticDataset(exp, length=8)
    loader = DataLoader(ds, exp.train.batch_size, shuffle=False,
                        drop_last=True, num_workers=1, prefetch=0)
    trainer.run(dataloader=loader, max_steps=2)

    run_dir = os.path.join(str(tmp_path), exp.name)
    fid_path = os.path.join(run_dir, "fid_iter.txt")
    metrics_path = os.path.join(run_dir, "metrics_iter.txt")
    assert os.path.exists(fid_path), "training eval must record FID history"
    assert os.path.exists(metrics_path)

    fid_line = open(fid_path).read().strip().splitlines()[-1]
    # reference iter_counter.record_fid line format (:100-108)
    assert "split=train," in fid_line and "fid=" in fid_line
    assert "num_samples=2" in fid_line
    fid_val = float(fid_line.rsplit("fid=", 1)[1])
    assert np.isfinite(fid_val)

    metrics_line = open(metrics_path).read().strip().splitlines()[-1]
    assert "psnr/mean=" in metrics_line and "rmse/mean=" in metrics_line
