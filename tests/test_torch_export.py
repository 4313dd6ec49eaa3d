"""Exported checkpoints load into the ACTUAL reference torch modules.

test_network_parity proves the import direction (reference weights ->
deepsee_tpu).  This file proves the export direction a reference user
needs to migrate back: weights trained here produce `<epoch>_net_*.pth`
files that the reference's own strict `load_state_dict` / `load_network`
(util/util.py:228-237) accept unchanged — including the reference's dead
params and BN bookkeeping buffers, which the exporter synthesizes
(utils/torch_import.complete_for_reference) — and the torch nets then
compute the same outputs as the flax nets that produced the weights.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import torch

from ref_utils import make_ref_opt, to_nchw, to_nhwc

from deepsee_tpu.config import ModelConfig
from deepsee_tpu.models.discriminator import MultiscaleDiscriminator
from deepsee_tpu.models.encoder import CombinedStyleEncoder
from deepsee_tpu.models.generator import DeepSEEGenerator
from deepsee_tpu.utils.torch_import import (complete_for_reference,
                                            export_reference_checkpoint,
                                            export_torch_state)

TINY = ModelConfig(start_size=16, crop_size=64, load_size=64, ngf=4, nef=4,
                   ndf=4, regional_style_size=16, max_fm_size=64,
                   add_noise=False, compute_dtype="float32")


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _onehot(b, h, w, n, seed=1):
    rng = np.random.RandomState(seed)
    lab = rng.randint(0, n, size=(b, h, w))
    return np.eye(n, dtype=np.float32)[lab]


def assert_close(got, want, rtol=2e-5, atol=1e-5):
    got, want = np.asarray(got), np.asarray(want)
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=rtol * scale + atol)


def _nontrivial_variables(mod, init_args, init_rngs=None, **init_kwargs):
    """init, then perturb params so parity isn't trivially zeros-vs-zeros
    (exercises sign/axis mistakes the zero init would hide)."""
    rngs = init_rngs or jax.random.PRNGKey(0)
    variables = dict(mod.init(rngs, *init_args, **init_kwargs))
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    variables["params"] = jax.tree_util.tree_unflatten(treedef, leaves)
    return variables


def test_generator_export_strict_load_and_parity():
    from deepsee_models.networks.sr import DeepSEESR

    cfg = TINY  # spectrallateseansyncbatch3x3: SEAN blocks + sync BN stats
    lr = np.tanh(_rand((2, cfg.start_size, cfg.start_size, 3)))
    seg = _onehot(2, cfg.crop_size, cfg.crop_size, cfg.semantic_nc)
    style = np.tanh(_rand((2, cfg.label_nc, cfg.regional_style_size), seed=2))

    mod = DeepSEEGenerator(cfg)
    variables = _nontrivial_variables(
        mod, (jnp.asarray(lr), jnp.asarray(seg), jnp.asarray(style)),
        train=False)

    sd = complete_for_reference(export_torch_state(variables))
    ref = DeepSEESR(make_ref_opt(cfg))
    ref.load_state_dict(sd)  # strict: every reference key present, no extras

    ref.eval()
    with torch.no_grad():
        want = to_nhwc(ref(to_nchw(lr), to_nchw(seg),
                           torch.from_numpy(style)))
    got = mod.apply(variables, jnp.asarray(lr), jnp.asarray(seg),
                    jnp.asarray(style), train=False)
    assert_close(got, want)


def test_combined_encoder_export_strict_load_and_parity():
    from deepsee_models.networks.encoder import CombinedstyleEncoder

    cfg = TINY
    x_full = np.tanh(_rand((2, cfg.crop_size, cfg.crop_size, 3)))
    x_mini = np.tanh(_rand((2, cfg.start_size, cfg.start_size, 3), seed=7))
    seg = _onehot(2, cfg.crop_size, cfg.crop_size, cfg.semantic_nc)

    mod = CombinedStyleEncoder(cfg)
    variables = _nontrivial_variables(
        mod,
        (jnp.asarray(x_full), jnp.asarray(seg), jnp.asarray(x_mini),
         jnp.asarray(seg), True),
        init_rngs={"params": jax.random.PRNGKey(0),
                   "noise": jax.random.PRNGKey(1)},
        # static no_noise=True would skip creating noise_weights at init;
        # training inits materialize it, so export must cover it
        no_noise=False, train=False)

    sd = complete_for_reference(export_torch_state(variables))
    ref = CombinedstyleEncoder(make_ref_opt(cfg))
    ref.load_state_dict(sd)

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


def test_discriminator_export_strict_load_and_parity():
    from deepsee_models.networks.discriminator import (
        MultiscaleDiscriminator as RefD)

    cfg = TINY
    x = _rand((2, cfg.crop_size, cfg.crop_size,
               cfg.semantic_nc + cfg.output_nc))

    mod = MultiscaleDiscriminator(cfg)
    variables = _nontrivial_variables(mod, (jnp.asarray(x),), train=False)

    sd = complete_for_reference(export_torch_state(variables))
    ref = RefD(make_ref_opt(cfg))
    ref.load_state_dict(sd)

    ref.eval()
    with torch.no_grad():
        want = ref(to_nchw(x))
    got = mod.apply(variables, jnp.asarray(x), train=False)
    for scale_got, scale_want in zip(got, want):
        for g, w in zip(scale_got, scale_want):
            assert_close(g, to_nhwc(w))


def test_reference_load_network_reads_exported_files(tmp_path):
    """End to end through the reference's OWN loader: export_reference_
    checkpoint writes files, util.util.load_network consumes them."""
    from deepsee_models.networks.sr import DeepSEESR
    from util.util import load_network

    cfg = TINY
    lr = np.tanh(_rand((1, cfg.start_size, cfg.start_size, 3)))
    seg = _onehot(1, cfg.crop_size, cfg.crop_size, cfg.semantic_nc)
    style = np.tanh(_rand((1, cfg.label_nc, cfg.regional_style_size), seed=2))

    mod = DeepSEEGenerator(cfg)
    variables = _nontrivial_variables(
        mod, (jnp.asarray(lr), jnp.asarray(seg), jnp.asarray(style)),
        train=False)

    run_dir = tmp_path / "exported_run"
    run_dir.mkdir()
    written = export_reference_checkpoint(
        SimpleNamespace(g=variables, e=None, d=None), str(run_dir),
        epoch="30")
    assert set(written) == {"SR"}
    assert (run_dir / "30_net_SR.pth").exists()

    opt = SimpleNamespace(checkpoints_dir=str(tmp_path), name="exported_run")
    ref = DeepSEESR(make_ref_opt(cfg))
    ref = load_network(ref, "SR", "30", opt)

    ref.eval()
    with torch.no_grad():
        want = to_nhwc(ref(to_nchw(lr), to_nchw(seg),
                           torch.from_numpy(style)))
    got = mod.apply(variables, jnp.asarray(lr), jnp.asarray(seg),
                    jnp.asarray(style), train=False)
    assert_close(got, want)


def test_export_import_roundtrip_bitexact():
    """export -> import_torch_state reproduces every leaf bit-exactly
    (the stronger two-sided completion check on one net with all three
    collections: params, batch_stats, spectral)."""
    from deepsee_tpu.utils.torch_import import import_torch_state

    cfg = TINY
    lr = jnp.asarray(np.tanh(_rand((1, cfg.start_size, cfg.start_size, 3))))
    seg = jnp.asarray(_onehot(1, cfg.crop_size, cfg.crop_size,
                              cfg.semantic_nc))
    style = jnp.asarray(np.tanh(_rand(
        (1, cfg.label_nc, cfg.regional_style_size), seed=2)))

    mod = DeepSEEGenerator(cfg)
    variables = _nontrivial_variables(mod, (lr, seg, style), train=False)

    sd = complete_for_reference(export_torch_state(variables))
    back = import_torch_state(variables, sd, strict=True)
    flat_a = jax.tree_util.tree_leaves(variables)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
