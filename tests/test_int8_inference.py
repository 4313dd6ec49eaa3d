"""W8A8 quantized inference path (layers.int8_inference).

Serving-only: Conv2d/_conv switch to s8 x s8 -> s32 convs (per-output-channel
weight scales, dynamic per-tensor activation scale) when traced inside the
context.  Measured 1.4-1.5x the bf16 conv throughput on v5e
(scripts/probe_int8.py); these tests pin the numerics and the gating.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.models.layers import _int8_conv, int8_inference
from deepsee_tpu.system import SRSystem


def test_int8_conv_matches_fp_within_quant_error():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 64), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    q = _int8_conv(x, k, (1, 1), ((1, 1), (1, 1)))
    rel = float(jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, f"quantization error too large: {rel}"


def test_int8_smoothquant_halves_error_on_disparate_ranges():
    """The SmoothQuant equalization (alpha=0.5) must beat plain per-tensor
    quantization when per-channel activation ranges are disparate (the
    post-instance-norm/modulation regime), and be a no-op-grade change on
    uniform ranges.  A sign/axis mistake in s_c fails the first assert."""
    rng = np.random.RandomState(0)
    scales = 10 ** np.linspace(-2, 1, 64)  # 3 decades of channel spread
    x = jnp.asarray(rng.randn(2, 16, 16, 64) * scales, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def rel(smooth):
        q = _int8_conv(x, k, (1, 1), ((1, 1), (1, 1)), smooth=smooth)
        return float(jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref))

    plain, smoothed = rel(False), rel(True)
    assert smoothed < 0.7 * plain, (plain, smoothed)

    # uniform ranges: smoothing must not make things worse
    xu = jnp.asarray(rng.randn(2, 16, 16, 64), jnp.float32)
    refu = jax.lax.conv_general_dilated(
        xu, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def relu_(smooth):
        q = _int8_conv(xu, k, (1, 1), ((1, 1), (1, 1)), smooth=smooth)
        return float(jnp.linalg.norm(q - refu) / jnp.linalg.norm(refu))

    assert relu_(True) < 1.2 * relu_(False)


def test_int8_generator_forward_close_and_uses_s8():
    exp = tiny_test_experiment(is_train=False)
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    cfg = exp.model

    rng = np.random.RandomState(0)
    batch = {
        "image_hr": jnp.asarray(
            np.tanh(rng.randn(2, cfg.crop_size, cfg.crop_size, 3)),
            jnp.float32),
        "label": jnp.asarray(
            rng.randint(0, cfg.label_nc, (2, cfg.crop_size, cfg.crop_size)),
            jnp.int32),
    }

    def fwd(g, e, batch):
        pre = system.preprocess(batch)
        fake, _, _ = system.generate(g, e, pre, use_full=False,
                                     no_noise=True, train=False)
        return fake

    ref = jax.jit(fwd)(variables.g, variables.e, batch)

    # min_ch lowered so the tiny test model's convs actually quantize
    with int8_inference(min_ch=8):
        jitted = jax.jit(fwd)
        hlo = jitted.lower(variables.g, variables.e, batch).as_text()
        q = jitted(variables.g, variables.e, batch)
    # StableHLO spells int8 "i8"; demand actual quantized convolutions
    assert any("convolution" in line and "i8>" in line
               for line in hlo.splitlines()), (
        "quantized trace must contain int8 convolutions")

    # tanh outputs in [-1,1]: per-conv ~0.4% quant noise compounds through
    # the trunk; demand visual-equivalence-grade agreement
    err = float(jnp.mean(jnp.abs(q - ref)))
    assert err < 0.05, f"int8 output drifted: mean|d|={err}"

    # outside the context the same fn traces full-precision again
    hlo_fp = jax.jit(fwd).lower(variables.g, variables.e, batch).as_text()
    assert hlo != hlo_fp


@pytest.mark.slow
def test_int8_never_active_in_training_step():
    """Conv2d requires train=False for the quantized path: a train-step
    trace inside the context must stay full-precision on the trunk."""
    from deepsee_tpu.train import create_train_state, make_train_step

    exp = tiny_test_experiment()
    system = SRSystem(exp)
    state = create_train_state(system, jax.random.PRNGKey(0))
    step = make_train_step(system, donate=False)
    rng = np.random.RandomState(0)
    cfg = exp.model
    batch = {
        "image_hr": np.tanh(rng.randn(2, cfg.crop_size, cfg.crop_size, 3))
        .astype(np.float32),
        "label": rng.randint(0, cfg.label_nc,
                             (2, cfg.crop_size, cfg.crop_size)).astype(np.int32),
    }
    with int8_inference(min_ch=8):
        state2, logs = step(state, batch)
    logs = jax.device_get(logs)
    assert np.isfinite(logs["GAN"])


def test_quantized_export_roundtrip(tmp_path):
    from deepsee_tpu.serve import export_serving, load_serving, save_serving

    exp = tiny_test_experiment(is_train=False)
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    cfg = exp.model
    rng = np.random.RandomState(0)
    lr = jnp.asarray(
        np.tanh(rng.randn(1, cfg.start_size, cfg.start_size, 3)), jnp.float32)
    lab = jnp.asarray(
        rng.randint(0, cfg.label_nc, (1, cfg.crop_size, cfg.crop_size)),
        jnp.int32)

    blobs = export_serving(exp, variables, batch_size=1, platforms=("cpu",))
    blobs_q = export_serving(exp, variables, batch_size=1, platforms=("cpu",),
                             quantize="int8")
    save_serving(str(tmp_path), exp, blobs_q, 1, ("cpu",), quantize="int8")

    import json
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert manifest["quantize"] == "int8"

    fn_q = load_serving(str(tmp_path))
    fake_q, _ = fn_q(lr, lab)

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        save_serving(d, exp, blobs, 1, ("cpu",))
        fake_fp, _ = load_serving(d)(lr, lab)
    # tiny model's convs are below the default min_ch=64 -> identical
    # programs would also pass; assert closeness, not equality
    err = float(jnp.mean(jnp.abs(fake_q - fake_fp)))
    assert err < 0.05


@pytest.mark.slow
def test_int8_evaluator_run():
    """evaluate.py --int8 semantics: the metric sweep runs with the
    generation traced inside the quantized context and yields finite
    metrics."""
    from deepsee_tpu.data import DataLoader, SyntheticDataset
    from deepsee_tpu.eval.evaluator import InferenceEvaluator

    exp = tiny_test_experiment().replace(is_train=False)
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    ds = SyntheticDataset(exp, length=4)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                        num_workers=1, prefetch=0)
    ev = InferenceEvaluator(system, num_samples=2, compute_fid=False,
                            compute_lpips=False)
    with int8_inference(min_ch=8):
        result = ev.run(variables, loader)
    for key in ("psnr/mean", "ssim/mean", "rmse/mean"):
        assert key in result and np.isfinite(result[key]), (key, result)


@pytest.mark.slow
def test_int8_under_mesh_matches_single_device():
    """int8 inference composed with the mesh (dp x tp AND dp x sp): the
    quantized program must still trace int8 convolutions and agree with the
    single-device quantized output.  The dynamic activation scale is a
    global max-reduce, so sharding must not change which scale is picked —
    only reduction order can differ (tolerance covers a rounding flip)."""
    from deepsee_tpu.config import MeshConfig
    from deepsee_tpu.parallel import (make_mesh, shard_batch,
                                      shard_system_variables)

    exp = tiny_test_experiment(is_train=False)
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    cfg = exp.model

    rng = np.random.RandomState(0)
    b = 4
    batch = {
        "image_hr": np.tanh(rng.randn(b, cfg.crop_size, cfg.crop_size, 3))
        .astype(np.float32),
        "label": rng.randint(0, cfg.label_nc,
                             (b, cfg.crop_size, cfg.crop_size))
        .astype(np.int32),
    }

    def fwd(g, e, batch):
        pre = system.preprocess(batch)
        fake, _, _ = system.generate(g, e, pre, use_full=False,
                                     no_noise=True, train=False)
        return fake

    with int8_inference(min_ch=8):
        want = np.asarray(jax.device_get(jax.jit(fwd)(
            variables.g, variables.e,
            {k: jnp.asarray(v) for k, v in batch.items()})))

        for spatial in (False, True):
            mesh = make_mesh(MeshConfig(2, 4))
            svars = variables.replace(
                g=shard_system_variables(variables.g, mesh,
                                         shard_model=not spatial,
                                         min_shard_ch=8),
                e=shard_system_variables(variables.e, mesh,
                                         shard_model=not spatial,
                                         min_shard_ch=8))
            sbatch = shard_batch(batch, mesh, spatial=spatial)
            jitted = jax.jit(fwd)
            hlo = jitted.lower(svars.g, svars.e, sbatch).as_text()
            assert any("convolution" in ln and "i8>" in ln
                       for ln in hlo.splitlines()), (
                f"mesh trace (spatial={spatial}) lost the int8 convs")
            got = np.asarray(jax.device_get(jitted(svars.g, svars.e, sbatch)))
            assert float(np.mean(np.abs(got - want))) < 5e-3, spatial
            np.testing.assert_allclose(got, want, atol=0.08)


@pytest.mark.slow
def test_int8_export_rejects_unknown_mode():
    from deepsee_tpu.serve import export_serving

    exp = tiny_test_experiment(is_train=False)
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        export_serving(exp, variables, quantize="fp4")
