"""Edge paths: learned shortcut (fin != fout), dontcare label, nonsquare."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from ref_utils import make_ref_opt, to_nchw, to_nhwc

from deepsee_tpu.config import ModelConfig, tiny_test_experiment
from deepsee_tpu.models.blocks import SPADEResnetBlock
from deepsee_tpu.ops.preprocess import one_hot_label
from deepsee_tpu.utils.torch_import import import_torch_state

TINY = ModelConfig(start_size=16, crop_size=64, load_size=64, ngf=4, nef=4,
                   regional_style_size=16, max_fm_size=64, add_noise=False,
                   compute_dtype="float32",
                   norm_g="spectralseansyncbatch3x3")


def test_resblock_learned_shortcut_parity():
    """fin != fout engages norm_s + spectral 1x1 conv_s
    (architecture.py:36-52,132-144)."""
    from deepsee_models.networks.architecture import (
        SPADEResnetBlock as RefBlock)

    opt = make_ref_opt(TINY)
    torch.manual_seed(3)
    ref = RefBlock(16, 8, opt, style=True)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 16).astype(np.float32)
    seg = np.eye(TINY.semantic_nc, dtype=np.float32)[
        rng.randint(0, TINY.semantic_nc, (2, 64, 64))]
    style = np.tanh(rng.randn(2, TINY.label_nc, 16)).astype(np.float32)

    mod = SPADEResnetBlock(16, 8, TINY, style=True)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(seg), jnp.asarray(style), train=False)
    variables = import_torch_state(variables, ref.state_dict(), strict=True)

    ref.eval()
    with torch.no_grad():
        want = to_nhwc(ref(to_nchw(x), to_nchw(seg), torch.from_numpy(style)))
    got = np.asarray(mod.apply(variables, jnp.asarray(x), jnp.asarray(seg),
                               jnp.asarray(style), train=False))
    assert got.shape[-1] == 8
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-5 * scale)


def test_dontcare_label_one_hot():
    """contain_dontcare_label: 255 -> label_nc, semantic_nc = label_nc + 1
    (base_options.py:74-75,233; base_dataset.py:95)."""
    import dataclasses

    cfg = dataclasses.replace(tiny_test_experiment().model,
                              contain_dontcare_label=True)
    assert cfg.semantic_nc == cfg.label_nc + 1
    lab = np.array([[0, 5, cfg.label_nc]], dtype=np.int32)[None]  # (1,1,3)
    oh = np.asarray(one_hot_label(jnp.asarray(lab), cfg.semantic_nc))
    assert oh.shape[-1] == 20
    assert oh[0, 0, 2, cfg.label_nc] == 1.0  # dontcare channel


def test_generator_runs_with_dontcare():
    import dataclasses

    cfg = dataclasses.replace(tiny_test_experiment().model,
                              contain_dontcare_label=True)
    from deepsee_tpu.models.generator import DeepSEEGenerator

    gen = DeepSEEGenerator(cfg)
    rng = np.random.RandomState(0)
    lr = jnp.asarray(np.tanh(rng.randn(1, cfg.start_size, cfg.start_size, 3)),
                     jnp.float32)
    seg = jnp.asarray(np.eye(cfg.semantic_nc, dtype=np.float32)[
        rng.randint(0, cfg.semantic_nc, (1, cfg.crop_size, cfg.crop_size))])
    style = jnp.asarray(np.tanh(
        rng.randn(1, cfg.label_nc, cfg.regional_style_size)), jnp.float32)
    variables = gen.init({"params": jax.random.PRNGKey(0),
                          "noise": jax.random.PRNGKey(1)}, lr, seg, style,
                         train=True)
    out = gen.apply(variables, lr, seg, style, train=False)
    assert out.shape == (1, cfg.crop_size, cfg.crop_size, 3)
