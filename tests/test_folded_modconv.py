"""Folded subpixel modulation conv (512px hot-path optimization).

`_conv_on_nearest_up2` must equal conv3x3(nearest_up2(x)) exactly (up to
float reassociation): the nearest-2x duplication lets the 3x3 taps that
read the same source pixel be pre-summed, making each output phase a 2x2
conv at low resolution.  Verified at the op level (forward + gradients)
and at the module level (PureSEAN/SEAN blocks with the capped-fm path,
folded vs literal upsample-then-conv).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from deepsee_tpu.config import ModelConfig
from deepsee_tpu.models.normalization import (PureSEANBlock, SEANBlock,
                                              _conv, _conv_on_nearest_up2)
from deepsee_tpu.ops.resize import resize2d


def _ref(a, kernel, bias):
    up = resize2d(a, (2 * a.shape[1], 2 * a.shape[2]), method="nearest")
    return _conv(up, kernel, bias, jnp.float32, 1)


def test_folded_conv_matches_upsample_then_conv():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 6, 5, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 12) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(12), jnp.float32)

    want = _ref(a, k, b)
    got = _conv_on_nearest_up2(a, k, b, jnp.float32)
    assert got.shape == want.shape == (2, 12, 10, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_folded_conv_gradients_match():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(1, 4, 4, 6), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 6, 4) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(4), jnp.float32)
    cot = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)

    def loss(fn, a, k, b):
        return jnp.sum(fn(a, k, b) * cot)

    g_want = jax.grad(lambda *x: loss(_ref, *x), argnums=(0, 1, 2))(a, k, b)
    g_got = jax.grad(
        lambda a, k, b: loss(
            lambda a, k, b: _conv_on_nearest_up2(a, k, b, jnp.float32),
            a, k, b), argnums=(0, 1, 2))(a, k, b)
    for w, g in zip(g_want, g_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def _block_cfg(**kw):
    kw.setdefault("fold_upsampled_mod_conv", True)
    return ModelConfig(start_size=8, crop_size=64, load_size=64, ngf=2,
                       regional_style_size=128, max_fm_size=16,
                       add_noise=False, compute_dtype="float32", **kw)


def _run_block(block_cls, cfg, quirk_irrelevant_style=True):
    rng = np.random.RandomState(0)
    nc = 2 * 16  # norm_nc
    x = jnp.asarray(rng.randn(1, 32, 32, nc), jnp.float32)  # 2x the fm cap
    seg = jnp.asarray(
        np.eye(cfg.semantic_nc, dtype=np.float32)[
            rng.randint(0, cfg.semantic_nc, (1, 64, 64))])
    style = jnp.asarray(np.tanh(rng.randn(1, cfg.label_nc,
                                          cfg.regional_style_size)),
                        jnp.float32)
    mod = block_cls(cfg, nc)
    variables = mod.init(jax.random.PRNGKey(0), x, seg, style, train=False)
    out = mod.apply(variables, x, seg, style, train=False)
    return np.asarray(out), variables


def test_blocks_folded_equals_literal_path():
    for block_cls in (PureSEANBlock, SEANBlock):
        for quirk in (True, False):
            cfg_fold = _block_cfg(replicate_fm_resize_quirk=quirk)
            cfg_lit = dataclasses.replace(cfg_fold,
                                          fold_upsampled_mod_conv=False)
            got, v1 = _run_block(block_cls, cfg_fold)
            want, v2 = _run_block(block_cls, cfg_lit)
            # same init (same param shapes/seed) -> same weights
            for a, b in zip(jax.tree_util.tree_leaves(v1),
                            jax.tree_util.tree_leaves(v2)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_allclose(
                got, want, rtol=1e-5, atol=1e-5,
                err_msg=f"{block_cls.__name__} quirk={quirk}")


def test_block_grads_folded_equals_literal():
    cfg_fold = _block_cfg()
    cfg_lit = dataclasses.replace(cfg_fold, fold_upsampled_mod_conv=False)
    rng = np.random.RandomState(3)
    nc = 32
    x = jnp.asarray(rng.randn(1, 32, 32, nc), jnp.float32)
    seg = jnp.asarray(
        np.eye(cfg_fold.semantic_nc, dtype=np.float32)[
            rng.randint(0, cfg_fold.semantic_nc, (1, 64, 64))])
    style = jnp.asarray(np.tanh(rng.randn(1, cfg_fold.label_nc, 128)),
                        jnp.float32)

    def grads(cfg):
        mod = PureSEANBlock(cfg, nc)
        variables = mod.init(jax.random.PRNGKey(0), x, seg, style,
                             train=False)

        def loss(params):
            out = mod.apply(dict(variables, params=params), x, seg, style,
                            train=False)
            return jnp.mean(out ** 2)

        return jax.grad(loss)(variables["params"])

    for w, g in zip(jax.tree_util.tree_leaves(grads(cfg_lit)),
                    jax.tree_util.tree_leaves(grads(cfg_fold))):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-6)
