"""IterationCounter triggers/resume, images utils, model summary, profiling."""

import os

import numpy as np

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.utils.images import (label2im, load_style_matrix, save_image,
                                      save_style_matrix, tensor2im)
from deepsee_tpu.utils.iter_counter import IterationCounter
from deepsee_tpu.utils.model_summary import count_params, summarize


def _exp(tmp_path, **train_kw):
    import dataclasses
    exp = tiny_test_experiment().replace(checkpoints_dir=str(tmp_path))
    if train_kw:
        exp = exp.replace(train=dataclasses.replace(exp.train, **train_kw))
    return exp


def test_counter_triggers_and_resume(tmp_path):
    exp = _exp(tmp_path, batch_size=4, print_freq=8, save_latest_freq=12,
               niter=2, niter_decay=1)
    c = IterationCounter(exp, dataset_size=24)
    assert list(c.training_epochs()) == [1, 2, 3]

    prints, saves = [], []
    for epoch in c.training_epochs():
        c.record_epoch_start(epoch)
        for _ in range(6):  # 24 samples / bs 4
            c.record_one_iteration()
            if c.needs_printing():
                prints.append(c.total_steps_so_far)
            if c.needs_saving():
                saves.append(c.total_steps_so_far)
        c.record_epoch_end()
    # print every 8 samples, save every 12 (modular triggers)
    assert prints == [8, 16, 24, 32, 40, 48, 56, 64, 72]
    assert saves == [12, 24, 36, 48, 60, 72]

    c.append_eval_history("fid_iter.txt", 123.4)
    assert os.path.exists(os.path.join(c.checkpoints_dir, "fid_iter.txt"))

    # resume
    c2 = IterationCounter(exp, dataset_size=24, continue_train=True)
    assert c2.first_epoch == 3
    assert c2.total_steps_so_far == 72


def test_image_utils(tmp_path):
    img = np.linspace(-1, 1, 4 * 4 * 3, dtype=np.float32).reshape(4, 4, 3)
    u8 = tensor2im(img)
    assert u8.dtype == np.uint8 and u8.min() >= 0 and u8.max() <= 255

    lab = np.arange(16).reshape(4, 4) % 19
    rgb = label2im(lab)
    assert rgb.shape == (4, 4, 3)
    onehot = np.eye(19, dtype=np.float32)[lab]
    rgb2 = label2im(onehot)
    np.testing.assert_array_equal(rgb, rgb2)

    save_image(u8, str(tmp_path / "x.png"))
    assert os.path.exists(tmp_path / "x.png")

    style = np.random.RandomState(0).randn(19, 16).astype(np.float32)
    save_style_matrix(style, str(tmp_path / "s.csv"))
    np.testing.assert_allclose(load_style_matrix(str(tmp_path / "s.csv")),
                               style, rtol=1e-6)


def test_model_summary():
    import jax
    from deepsee_tpu.system import SRSystem

    exp = tiny_test_experiment()
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    n = count_params(variables.g["params"])
    assert n > 1000
    text = summarize({"SR": variables.g, "D": variables.d, "E": variables.e})
    assert "Network [SR]" in text and "million" in text


def test_profiling_timed():
    import jax.numpy as jnp
    from deepsee_tpu.utils.profiling import timed

    res = timed(lambda x: x * 2.0, jnp.ones((8, 8)), iters=2, warmup=1)
    assert res["median_s"] >= 0
