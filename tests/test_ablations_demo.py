"""Ablation generator variants + demo entry point."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.models.generator import DeepSEEGenerator


@pytest.mark.parametrize("variant", ["nostyle", "nospade", "puresean"])
def test_ablation_variants(variant):
    cfg = tiny_test_experiment().model
    gen = DeepSEEGenerator(cfg, variant=variant)
    rng = np.random.RandomState(0)
    lr = jnp.asarray(np.tanh(rng.randn(1, cfg.start_size, cfg.start_size, 3)),
                     jnp.float32)
    seg = jnp.asarray(np.eye(cfg.semantic_nc, dtype=np.float32)[
        rng.randint(0, cfg.semantic_nc, (1, cfg.crop_size, cfg.crop_size))])
    style = jnp.asarray(
        np.tanh(rng.randn(1, cfg.label_nc, cfg.regional_style_size)),
        jnp.float32)
    variables = gen.init({"params": jax.random.PRNGKey(0),
                          "noise": jax.random.PRNGKey(1)},
                         lr, seg, style, train=True)
    out = gen.apply(variables, lr, seg, style, train=False)
    assert out.shape == (1, cfg.crop_size, cfg.crop_size, 3)
    assert np.isfinite(np.asarray(out)).all()
    if variant == "nospade":
        # no SPADE params anywhere
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        names = ["/".join(str(k.key) for k in p) for p, _ in flat]
        assert not any("mlp" in n for n in names)


def test_pix2pix_block_matches_reference(tmp_path):
    """Reflection-pad resblock parity vs ablation.py:13-29."""
    import torch
    from ref_utils import make_ref_opt, to_nchw, to_nhwc
    from deepsee_models.networks.ablation import ResnetBlock
    from deepsee_models.networks.normalization import get_nonspade_norm_layer
    from deepsee_tpu.models.generator import Pix2PixResnetBlock
    from deepsee_tpu.utils.torch_import import import_torch_state

    cfg = tiny_test_experiment().model
    opt = make_ref_opt(cfg)
    norm_layer = get_nonspade_norm_layer(opt, "spectralinstance")
    ref = ResnetBlock(8, norm_layer)

    x = np.random.RandomState(0).randn(2, 8, 8, 8).astype(np.float32)
    mod = Pix2PixResnetBlock(8, cfg)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    # map torch Sequential indices: conv_block.1.0 / conv_block.4.0
    sd = {k.replace("conv_block.1.0", "conv_block_0.conv")
           .replace("conv_block.4.0", "conv_block_1.conv"): v
          for k, v in ref.state_dict().items()}
    variables = import_torch_state(variables, sd, strict=True)

    ref.eval()
    with torch.no_grad():
        want = to_nhwc(ref(to_nchw(x)))
    got = mod.apply(variables, jnp.asarray(x), train=False)
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                               atol=2e-5 * scale)


def test_demo_entry(tmp_path):
    from demo import Demo

    exp = tiny_test_experiment().replace(is_train=False)
    cfg = exp.model
    rng = np.random.RandomState(0)
    lr_path = str(tmp_path / "lr.png")
    sem_path = str(tmp_path / "sem.png")
    hr_path = str(tmp_path / "hr.png")
    Image.fromarray(rng.randint(0, 255, (cfg.start_size, cfg.start_size, 3),
                                dtype=np.uint8)).save(lr_path)
    Image.fromarray(rng.randint(0, cfg.label_nc,
                                (cfg.crop_size, cfg.crop_size),
                                dtype=np.uint8)).save(sem_path)
    Image.fromarray(rng.randint(0, 255, (cfg.crop_size, cfg.crop_size, 3),
                                dtype=np.uint8)).save(hr_path)

    demo = Demo(exp)
    out_dir = str(tmp_path / "out")

    # independent: style from LR
    r1 = demo.run(lr_path, sem_path, out_dir=out_dir)
    assert os.path.exists(r1["save_path"])
    assert os.path.exists(r1["save_path"][:-4] + ".csv")
    assert r1["fake_image"].shape == (1, cfg.crop_size, cfg.crop_size, 3)

    # style from saved CSV round trip (before r2, which reuses the filename)
    r3 = demo.run(lr_path, sem_path, out_dir=out_dir,
                  path_encoded_style=r1["save_path"][:-4] + ".csv")
    np.testing.assert_allclose(np.asarray(r3["encoded_style"]),
                               np.asarray(r1["encoded_style"]), atol=1e-5)

    # style from HR images with region splice
    r2 = demo.run(lr_path, sem_path, out_dir=out_dir, inputs_hr=[
        {"path_image_hr": hr_path, "path_semantics": sem_path,
         "regions": "all"},
        {"path_image_hr": hr_path, "path_semantics": sem_path,
         "regions": [11, 12]},
    ])
    assert os.path.exists(r2["save_path"])
