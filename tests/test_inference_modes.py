"""Smoke + semantics tests for the explorative inference toolbox."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.inference import modes
from deepsee_tpu.regions import CONSISTENT_REGIONS
from deepsee_tpu.system import SRSystem


@pytest.fixture(scope="module")
def setup():
    exp = tiny_test_experiment().replace(is_train=False, noise_delta=0.3)
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    cfg = exp.model
    rng = np.random.RandomState(0)
    b = 2
    batch = system.preprocess({
        "image_hr": jnp.asarray(
            np.tanh(rng.randn(b, cfg.crop_size, cfg.crop_size, 3)),
            jnp.float32),
        "label": jnp.asarray(
            rng.randint(0, cfg.label_nc, (b, cfg.crop_size, cfg.crop_size)),
            jnp.int32),
    })
    return system, variables, batch


def test_encode_and_generate(setup):
    system, variables, batch = setup
    style = modes.encode_only(system, variables, batch)
    cfg = system.cfg
    assert style.shape == (2, cfg.label_nc, cfg.regional_style_size)
    assert float(jnp.abs(style).max()) <= 1.0 + 1e-5
    fake = modes.generate_with_style(system, variables, batch, style)
    assert fake.shape == (2, cfg.crop_size, cfg.crop_size, 3)


def test_baseline(setup):
    system, variables, batch = setup
    up = modes.baseline_upscale(system, batch)
    assert up.shape[1] == system.cfg.crop_size
    assert float(jnp.abs(up).max()) <= 1.0


def test_inference_noise(setup):
    system, variables, batch = setup
    out = modes.inference_noise(system, variables, batch,
                                jax.random.PRNGKey(1), n=3)
    assert out.shape[:2] == (2, 3)


def test_multi_modal_ties_consistent_regions(setup):
    system, variables, batch = setup
    fakes, styles = modes.inference_multi_modal(
        system, variables, batch, jax.random.PRNGKey(2), n=2)
    assert fakes.shape[:2] == (2, 2)
    s = np.asarray(styles)
    for r in CONSISTENT_REGIONS:
        np.testing.assert_array_equal(s[:, :, r], s[:, :, r + 1])


def test_interpolation_middle_is_unperturbed(setup):
    system, variables, batch = setup
    style = modes.encode_only(system, variables, batch)
    fakes, styles = modes.inference_interpolation(
        system, variables, batch, style=style, n=3, delta=0.2)
    assert fakes.shape[:2] == (2, 3)
    np.testing.assert_allclose(np.asarray(styles)[:, 1], np.asarray(style),
                               atol=1e-6)


def test_interpolation_style_endpoints(setup):
    system, variables, batch = setup
    s0 = modes.encode_only(system, variables, batch)
    s1 = jnp.clip(s0 + 0.3, -1, 1)
    fakes, styles = modes.inference_interpolation_style(
        system, variables, batch, s0, s1, n=3)
    np.testing.assert_allclose(np.asarray(styles)[:, 0], np.asarray(s0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(styles)[:, -1], np.asarray(s1),
                               atol=1e-6)


def test_replace_and_reference_semantics(setup):
    system, variables, batch = setup
    before, after = modes.inference_replace_semantics(system, variables, batch)
    assert before.shape == after.shape
    grid = modes.inference_reference_semantics(system, variables, batch)
    assert grid.shape[:2] == (2, 2)


def test_reference_transplant_and_interpolation(setup):
    system, variables, batch = setup
    grid = modes.inference_reference(system, variables, batch)
    assert grid.shape[:2] == (2, 2)
    assert np.isfinite(np.asarray(grid)).all()
    # (untrained tanh outputs saturate to +/-1, so image-difference asserts
    # are not meaningful here; the style-splice math is covered by the
    # interpolation/multi-modal style assertions above)

    walk = modes.inference_reference_interpolation(system, variables, batch,
                                                   n=3)
    assert walk.shape[:2] == (2, 3)


def test_particular_modes(setup):
    system, variables, batch = setup
    fake, style = modes.inference_particular_combined(
        system, variables, batch, jax.random.PRNGKey(3))
    assert fake.shape[0] == 2
    out = modes.inference_particular_full(system, variables, batch)
    assert "fake_image_original" in out


def test_particular_full_guiding_differs_from_original():
    """sr_model.py:347-380: 'original' encodes the GT HR image, 'guiding'
    the guiding image — with different images they must differ (a previous
    version encoded the guiding image twice)."""
    import dataclasses

    exp = tiny_test_experiment().replace(is_train=False)
    exp = exp.replace(model=dataclasses.replace(
        exp.model, net_e="fullstyle", guiding_style_image=True))
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    cfg = exp.model
    rng = np.random.RandomState(0)
    b = 2
    batch = system.preprocess({
        "image_hr": jnp.asarray(
            np.tanh(rng.randn(b, cfg.crop_size, cfg.crop_size, 3)),
            jnp.float32),
        "label": jnp.asarray(
            rng.randint(0, cfg.label_nc, (b, cfg.crop_size, cfg.crop_size)),
            jnp.int32),
        "guiding_image": jnp.asarray(
            np.tanh(rng.randn(b, cfg.crop_size, cfg.crop_size, 3)),
            jnp.float32),
        "guiding_label": jnp.asarray(
            rng.randint(0, cfg.label_nc, (b, cfg.crop_size, cfg.crop_size)),
            jnp.int32),
    })
    # The random-init tiny model saturates its output tanh, which absorbs
    # small style differences — so pin the *encode inputs* via a spy: the
    # "original" encode must exclude the guiding keys (else encoder_inputs
    # picks the guiding image for both, system.py:125-126), the "guiding"
    # encode must include them.
    calls = []
    real = system.encode_jit  # materialize the cached_property

    def spy(e_vars, b, use_full, no_noise):
        calls.append(sorted(b.keys()))
        return real(e_vars, b, use_full, no_noise)

    system.__dict__["encode_jit"] = spy
    out = modes.inference_particular_full(system, variables, batch)
    assert "fake_image_guiding" in out and "fake_image_original" in out
    assert len(calls) == 2
    assert "guiding_image" not in calls[0], (
        "'original' must encode the GT HR image")
    assert "guiding_image" in calls[1]
    # and the two encodes really produce different styles
    sf = real(variables.e, {k: v for k, v in modes._arrays(batch).items()
                            if not k.startswith("guiding")}, True, True)
    sg = real(variables.e, modes._arrays(batch), True, True)
    assert float(jnp.abs(sf - sg).max()) > 1e-4


def test_arrays_accepts_numpy_batches():
    """Batches straight from the DataLoader hold numpy arrays; _arrays must
    convert rather than silently drop them (a dropped image_hr sends the
    encoder to its zeros-HR fallback)."""
    a = modes._arrays({"image_lr": np.zeros((1, 8, 8, 3), np.float32),
                       "path": ["x.png"]})
    assert "image_lr" in a and isinstance(a["image_lr"], jnp.ndarray)
    assert "path" not in a
