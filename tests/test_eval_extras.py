"""LPIPS math parity (vs a torch replica of the reference equations),
Frechet distance sanity, inception smoke, end-to-end evaluator harness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from deepsee_tpu.eval.lpips import (_ALEX_CONVS, load_lpips_params, lpips)
from deepsee_tpu.eval.fid import (fid_from_activations, frechet_distance,
                                  inception_pool3, load_inception_params)


def test_lpips_matches_torch_replica():
    """Replicates networks_basic.py:63-97 in torch with the same (random
    backbone + shipped lin) weights and compares."""
    params, exact = load_lpips_params()
    assert not exact  # no pretrained alexnet in this image

    rng = np.random.RandomState(0)
    img0 = np.tanh(rng.randn(2, 64, 64, 3)).astype(np.float32)
    img1 = np.tanh(rng.randn(2, 64, 64, 3)).astype(np.float32)

    got = np.asarray(lpips(params, jnp.asarray(img0), jnp.asarray(img1)))

    # torch replica
    shift = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    scale = torch.tensor([.458, .448, .450])[None, :, None, None]

    def feats(x):
        taps = []
        y = (x - shift) / scale
        for i, (_, _, stride, pad) in enumerate(_ALEX_CONVS):
            if i in (1, 2):
                y = F.max_pool2d(y, 3, 2)
            w = torch.from_numpy(
                np.asarray(params[f"conv{i}_kernel"]).transpose(3, 2, 0, 1).copy())
            b = torch.from_numpy(np.asarray(params[f"conv{i}_bias"]).copy())
            y = F.relu(F.conv2d(y, w, b, stride=stride, padding=pad))
            taps.append(y)
        return taps

    t0 = torch.from_numpy(img0.transpose(0, 3, 1, 2))
    t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
    total = torch.zeros(2)
    for i, (a, b) in enumerate(zip(feats(t0), feats(t1))):
        na = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        w = torch.from_numpy(np.asarray(params[f"lin{i}"]).copy())
        total = total + (d * w[None, :, None, None]).sum(1).mean(dim=[1, 2])
    np.testing.assert_allclose(got, total.numpy(), rtol=1e-3, atol=1e-5)


def test_frechet_distance():
    rng = np.random.RandomState(0)
    a = rng.randn(500, 8)
    b = rng.randn(500, 8) + 1.0
    # identical stats -> 0
    assert abs(fid_from_activations(a, a)) < 1e-6
    d = fid_from_activations(a, b)
    assert d > 0
    # analytic check with diagonal gaussians
    mu1, mu2 = np.zeros(3), np.ones(3)
    s1 = np.eye(3) * 4.0
    s2 = np.eye(3) * 1.0
    # d^2 = |mu|^2 + tr(s1 + s2 - 2 sqrt(s1 s2)) = 3 + (12+3-2*3*2)/1
    want = 3.0 + (12.0 + 3.0 - 2.0 * 3.0 * 2.0)
    np.testing.assert_allclose(frechet_distance(mu1, s1, mu2, s2), want,
                               rtol=1e-6)


def test_frechet_fast_matches_scipy():
    # the fast symmetric-eigenvalue route must agree with the reference's
    # literal scipy.linalg.sqrtm route (fid_score.py:138-192) in both the
    # well-conditioned and the rank-deficient (N < D) regimes
    rng = np.random.RandomState(7)
    # well-conditioned: plenty of samples
    a = rng.randn(300, 32)
    b = rng.randn(300, 32) * 1.3 + 0.5
    np.testing.assert_allclose(fid_from_activations(a, b, method="fast"),
                               fid_from_activations(a, b, method="scipy"),
                               rtol=1e-8)
    # rank-deficient covariances: fewer samples than features (the FID-500
    # fallback regime) — fid_from_activations takes the cross-Gram nuclear
    # norm route here (_fid_from_grams); it must agree with the reference's
    # literal sqrtm of the singular covariance product
    a = rng.randn(20, 64)
    b = rng.randn(20, 64) + 1.0
    fast = fid_from_activations(a, b, method="fast")
    ref = fid_from_activations(a, b, method="scipy")
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-6)
    # identical stats still collapse to ~0 through the fast path
    assert abs(fid_from_activations(a, a, method="fast")) < 1e-5


def test_frechet_gram_route_matches_covariance_routes():
    from deepsee_tpu.eval.fid import _fid_from_grams, calculate_statistics

    rng = np.random.RandomState(11)
    # Inception-like nonnegative activations, n < D (Gram route eligible)
    a = np.abs(rng.randn(40, 96)) ** 1.3
    b = np.abs(rng.randn(56, 96)) ** 1.3 * 1.1 + 0.05
    gram = _fid_from_grams(a, b)
    mu1, s1 = calculate_statistics(a)
    mu2, s2 = calculate_statistics(b)
    # vs the symmetric-eig covariance path (its rank-deficient eigh branch)
    sym = frechet_distance(mu1, s1, mu2, s2, method="fast")
    np.testing.assert_allclose(gram, sym, rtol=1e-6, atol=1e-8)
    # vs the reference's literal scipy sqrtm path
    ref = frechet_distance(mu1, s1, mu2, s2, method="scipy")
    np.testing.assert_allclose(gram, ref, rtol=1e-4, atol=1e-6)
    # n > D must route to the covariance path and still agree (crossover)
    a = rng.randn(200, 24)
    b = rng.randn(180, 24) * 1.2 + 0.3
    np.testing.assert_allclose(fid_from_activations(a, b, method="fast"),
                               fid_from_activations(a, b, method="scipy"),
                               rtol=1e-7)
    # asymmetric eligibility: one side above D, one below -> covariance path
    a = rng.randn(30, 24)
    np.testing.assert_allclose(fid_from_activations(a, b, method="fast"),
                               fid_from_activations(a, b, method="scipy"),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_inception_pool3_shape():
    params, exact = load_inception_params()
    assert not exact
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 64, 64, 3).astype(np.float32)).clip(-1, 1)
    act = inception_pool3(params, x)
    assert act.shape == (1, 2048)
    assert np.isfinite(np.asarray(act)).all()


def test_inference_evaluator_end_to_end():
    from deepsee_tpu.config import tiny_test_experiment
    from deepsee_tpu.data import DataLoader, SyntheticDataset
    from deepsee_tpu.eval.evaluator import InferenceEvaluator
    from deepsee_tpu.system import SRSystem

    exp = tiny_test_experiment().replace(is_train=False)
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    ds = SyntheticDataset(exp, length=8)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                        num_workers=1, prefetch=0)

    ev = InferenceEvaluator(system, num_samples=4, compute_fid=False,
                            compute_lpips=True)
    result = ev.run(variables, loader)
    for key in ("psnr/mean", "ssim/mean", "rmse/mean", "lpips/mean"):
        assert key in result and np.isfinite(result[key]), (key, result)
    # ms_ssim is only well-defined for >=176px images (5 pooled levels);
    # at the tiny test size it can go NaN, same as the reference would.
    assert "ms_ssim/mean" in result
    assert result["n_samples"] == 4
