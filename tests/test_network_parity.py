"""Numerical parity of deepsee_tpu modules vs the reference torch modules.

Weights are initialized by the reference modules and imported through
deepsee_tpu.utils.torch_import, so these tests cover both the math and the
checkpoint-import path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ref_utils import make_ref_opt, to_nchw, to_nhwc

from deepsee_tpu.config import ModelConfig
from deepsee_tpu.models.blocks import SPADEResnetBlock
from deepsee_tpu.models.discriminator import MultiscaleDiscriminator
from deepsee_tpu.models.encoder import CombinedStyleEncoder, FullStyleEncoder
from deepsee_tpu.models.generator import DeepSEEGenerator
from deepsee_tpu.models.normalization import SEANBlock, SPADE
from deepsee_tpu.utils.torch_import import import_torch_state

TINY = ModelConfig(start_size=16, crop_size=64, load_size=64, ngf=4, nef=4,
                   ndf=4, regional_style_size=16, max_fm_size=64,
                   add_noise=False, compute_dtype="float32")


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _onehot(b, h, w, n, seed=1):
    rng = np.random.RandomState(seed)
    lab = rng.randint(0, n, size=(b, h, w))
    return np.eye(n, dtype=np.float32)[lab]


def _import(module, variables, ref_module):
    return import_torch_state(variables, ref_module.state_dict(), strict=True)


def assert_close(got, want, rtol=2e-5, atol=1e-5):
    """allclose with atol scaled by the output magnitude (untrained nets can
    emit values of magnitude ~1e3, making fixed atol meaningless)."""
    got, want = np.asarray(got), np.asarray(want)
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=rtol * scale + atol)


@pytest.mark.parametrize("norm_g", ["spadeinstance3x3", "spadesyncbatch3x3"])
def test_spade_parity(norm_g):
    from deepsee_models.networks.normalization import SPADE as RefSPADE

    cfg = TINY.__class__(**{**TINY.__dict__, "norm_g": norm_g})
    opt = make_ref_opt(cfg)
    ref = RefSPADE(norm_g, 8, cfg.semantic_nc, opt)

    x = _rand((2, 16, 16, 8))
    seg = _onehot(2, 32, 32, cfg.semantic_nc)

    mod = SPADE(cfg, 8)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(seg), None, train=False)
    variables = _import(mod, variables, ref)

    # eval mode (running stats)
    ref.eval()
    with torch.no_grad():
        want = to_nhwc(ref(to_nchw(x), to_nchw(seg)))
    got = mod.apply(variables, jnp.asarray(x), jnp.asarray(seg), None,
                    train=False)
    assert_close(got, want)

    # train mode (batch stats + running-stat update)
    ref.train()
    with torch.no_grad():
        want = to_nhwc(ref(to_nchw(x), to_nchw(seg)))
    got, mutated = mod.apply(variables, jnp.asarray(x), jnp.asarray(seg), None,
                             train=True, mutable=["batch_stats", "spectral"])
    assert_close(got, want)
    if "syncbatch" in norm_g:
        bs = mutated["batch_stats"]["pfn"]["param_free_norm"]
        np.testing.assert_allclose(
            np.asarray(bs["mean"]),
            ref.param_free_norm.running_mean.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(bs["var"]),
            ref.param_free_norm.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_sean_block_parity():
    from deepsee_models.networks.normalization import SEAN_Block

    cfg = TINY.__class__(**{**TINY.__dict__, "norm_g": "seansyncbatch3x3"})
    opt = make_ref_opt(cfg)
    ref = SEAN_Block("seansyncbatch3x3", 8, cfg.semantic_nc, opt)

    x = _rand((2, 32, 32, 8))
    seg = _onehot(2, 64, 64, cfg.semantic_nc)
    style = np.tanh(_rand((2, cfg.label_nc, cfg.regional_style_size), seed=2))

    mod = SEANBlock(cfg, 8)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(seg), jnp.asarray(style), train=False)
    variables = _import(mod, variables, ref)

    ref.eval()
    with torch.no_grad():
        want = to_nhwc(ref(to_nchw(x), to_nchw(seg),
                           torch.from_numpy(style)))
    got = mod.apply(variables, jnp.asarray(x), jnp.asarray(seg),
                    jnp.asarray(style), train=False)
    assert_close(got, want)


def test_resblock_parity_spectral():
    from deepsee_models.networks.architecture import (
        SPADEResnetBlock as RefBlock)

    cfg = TINY.__class__(**{**TINY.__dict__,
                            "norm_g": "spectralseansyncbatch3x3"})
    opt = make_ref_opt(cfg)
    ref = RefBlock(8, 8, opt, style=True)

    x = _rand((2, 16, 16, 8))
    seg = _onehot(2, 64, 64, cfg.semantic_nc)
    style = np.tanh(_rand((2, cfg.label_nc, cfg.regional_style_size), seed=2))

    mod = SPADEResnetBlock(8, 8, cfg, style=True)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(seg), jnp.asarray(style), train=False)
    variables = _import(mod, variables, ref)

    ref.eval()
    with torch.no_grad():
        want = to_nhwc(ref(to_nchw(x), to_nchw(seg), torch.from_numpy(style)))
    got = mod.apply(variables, jnp.asarray(x), jnp.asarray(seg),
                    jnp.asarray(style), train=False)
    assert_close(got, want)

    # train mode: one spectral power iteration + batch stats
    ref.train()
    with torch.no_grad():
        want = to_nhwc(ref(to_nchw(x), to_nchw(seg), torch.from_numpy(style)))
    got, mutated = mod.apply(variables, jnp.asarray(x), jnp.asarray(seg),
                             jnp.asarray(style), train=True,
                             mutable=["batch_stats", "spectral"])
    assert_close(got, want)
    # u vector evolved identically (invariant to kernel flatten order)
    u_ref = dict(ref.state_dict())["conv_0.weight_u"].numpy()
    u_got = np.asarray(mutated["spectral"]["conv_0"]["u"])
    np.testing.assert_allclose(u_got, u_ref, rtol=1e-4, atol=1e-5)


def test_generator_parity():
    from deepsee_models.networks.sr import DeepSEESR

    cfg = TINY  # spectrallateseansyncbatch3x3 default
    opt = make_ref_opt(cfg)
    ref = DeepSEESR(opt)

    b = 2
    lr = np.tanh(_rand((b, cfg.start_size, cfg.start_size, 3)))
    seg = _onehot(b, cfg.crop_size, cfg.crop_size, cfg.semantic_nc)
    style = np.tanh(_rand((b, cfg.label_nc, cfg.regional_style_size), seed=2))

    mod = DeepSEEGenerator(cfg)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(lr),
                         jnp.asarray(seg), jnp.asarray(style), train=False)
    variables = _import(mod, variables, ref)

    for train in (False, True):
        ref.train(train)
        with torch.no_grad():
            want = to_nhwc(ref(to_nchw(lr), to_nchw(seg),
                               torch.from_numpy(style)))
        if train:
            got, _ = mod.apply(variables, jnp.asarray(lr), jnp.asarray(seg),
                               jnp.asarray(style), train=True,
                               mutable=["batch_stats", "spectral"])
        else:
            got = mod.apply(variables, jnp.asarray(lr), jnp.asarray(seg),
                            jnp.asarray(style), train=False)
        assert_close(got, want)


def test_combined_encoder_parity():
    from deepsee_models.networks.encoder import CombinedstyleEncoder

    cfg = TINY
    opt = make_ref_opt(cfg)
    ref = CombinedstyleEncoder(opt)

    b = 2
    x_full = np.tanh(_rand((b, cfg.crop_size, cfg.crop_size, 3)))
    x_mini = np.tanh(_rand((b, cfg.start_size, cfg.start_size, 3), seed=7))
    seg = _onehot(b, cfg.crop_size, cfg.crop_size, cfg.semantic_nc)

    mod = CombinedStyleEncoder(cfg)
    variables = mod.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.asarray(x_full), jnp.asarray(seg), jnp.asarray(x_mini),
        jnp.asarray(seg), True, no_noise=True, train=False)
    variables = _import(mod, variables, ref)

    ref.eval()
    for mode, use_full in (("full", True), ("mini", False)):
        with torch.no_grad():
            x_in = to_nchw(x_full if use_full else x_mini)
            want, _ = ref(x_in, to_nchw(seg), mode=mode, no_noise=True)
        got = mod.apply(variables, jnp.asarray(x_full), jnp.asarray(seg),
                        jnp.asarray(x_mini), jnp.asarray(seg), use_full,
                        no_noise=True, train=False,
                        rngs={"noise": jax.random.PRNGKey(2)})
        assert_close(got, want.numpy())


def test_full_encoder_parity():
    from deepsee_models.networks.encoder import FullStyleEncoder as RefFull

    cfg = TINY.__class__(**{**TINY.__dict__, "net_e": "fullstyle",
                            "noisy_style_scale": 0.05})
    opt = make_ref_opt(cfg)
    ref = RefFull(opt)

    b = 2
    x = np.tanh(_rand((b, cfg.crop_size, cfg.crop_size, 3)))
    seg = _onehot(b, cfg.crop_size, cfg.crop_size, cfg.semantic_nc)

    mod = FullStyleEncoder(cfg)
    variables = mod.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.asarray(x), jnp.asarray(seg), no_noise=True, train=False)
    variables = _import(mod, variables, ref)

    ref.eval()
    with torch.no_grad():
        want, _ = ref(to_nchw(x), to_nchw(seg), no_noise=True)
    got = mod.apply(variables, jnp.asarray(x), jnp.asarray(seg),
                    no_noise=True, train=False,
                    rngs={"noise": jax.random.PRNGKey(2)})
    assert_close(got, want.numpy())


def test_discriminator_parity():
    from deepsee_models.networks.discriminator import (
        MultiscaleDiscriminator as RefD)

    cfg = TINY
    opt = make_ref_opt(cfg)
    ref = RefD(opt)

    b = 2
    x = _rand((b, cfg.crop_size, cfg.crop_size,
               cfg.semantic_nc + cfg.output_nc))

    mod = MultiscaleDiscriminator(cfg)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = _import(mod, variables, ref)

    ref.eval()
    with torch.no_grad():
        want = ref(to_nchw(x))
    got = mod.apply(variables, jnp.asarray(x), train=False)
    assert len(got) == len(want) == cfg.num_d
    for scale_got, scale_want in zip(got, want):
        assert len(scale_got) == len(scale_want)
        for g, w in zip(scale_got, scale_want):
            assert_close(g, to_nhwc(w))
