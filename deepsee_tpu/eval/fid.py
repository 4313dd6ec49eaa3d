"""FID: InceptionV3 (FID variant) activations + Frechet distance.

Rebuilt from evaluator/pytorch_fid/inception.py and fid_score.py and
evaluator/inception_util.py:

  * the FID Inception variant: TF-ported weights topology — InceptionA/C/E
    blocks use count_include_pad=False average pooling, the last E block uses
    max pooling in its pool branch (inception.py:193-310), 1008-class stem
  * inputs in [-1,1] -> [0,1] (inception_util.py:19), bilinear resize to
    299 (align_corners=False), then scaled back to [-1,1]
    (inception.py:146-153)
  * pool3 activations (2048-d) via global average pool
  * mu/cov statistics (inception_util.py:12-15) and the Sutherland-stable
    Frechet distance with the eps-diagonal retry (fid_score.py:138-192)

Weights: the pt_inception FID weights are a download the zero-egress image
lacks; `load_inception_params(path)` ingests them when provided (torchvision
state_dict format), else deterministic random init (relative FID comparisons
only; the loader returns exact=False).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from scipy import linalg

from deepsee_tpu.ops.resize import resize2d


# ---------------------------------------------------------------------------
# architecture spec: (name, cin, cout, (kh, kw), stride, (ph, pw))
# ---------------------------------------------------------------------------

def _conv_specs() -> List[Tuple[str, int, int, Tuple[int, int], int, Tuple[int, int]]]:
    specs = [
        ("Conv2d_1a_3x3", 3, 32, (3, 3), 2, (0, 0)),
        ("Conv2d_2a_3x3", 32, 32, (3, 3), 1, (0, 0)),
        ("Conv2d_2b_3x3", 32, 64, (3, 3), 1, (1, 1)),
        ("Conv2d_3b_1x1", 64, 80, (1, 1), 1, (0, 0)),
        ("Conv2d_4a_3x3", 80, 192, (3, 3), 1, (0, 0)),
    ]

    def a_block(name, cin, pf):
        return [
            (f"{name}.branch1x1", cin, 64, (1, 1), 1, (0, 0)),
            (f"{name}.branch5x5_1", cin, 48, (1, 1), 1, (0, 0)),
            (f"{name}.branch5x5_2", 48, 64, (5, 5), 1, (2, 2)),
            (f"{name}.branch3x3dbl_1", cin, 64, (1, 1), 1, (0, 0)),
            (f"{name}.branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1)),
            (f"{name}.branch3x3dbl_3", 96, 96, (3, 3), 1, (1, 1)),
            (f"{name}.branch_pool", cin, pf, (1, 1), 1, (0, 0)),
        ]

    specs += a_block("Mixed_5b", 192, 32)
    specs += a_block("Mixed_5c", 256, 64)
    specs += a_block("Mixed_5d", 288, 64)

    specs += [  # InceptionB (Mixed_6a)
        ("Mixed_6a.branch3x3", 288, 384, (3, 3), 2, (0, 0)),
        ("Mixed_6a.branch3x3dbl_1", 288, 64, (1, 1), 1, (0, 0)),
        ("Mixed_6a.branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1)),
        ("Mixed_6a.branch3x3dbl_3", 96, 96, (3, 3), 2, (0, 0)),
    ]

    def c_block(name, c7):
        return [
            (f"{name}.branch1x1", 768, 192, (1, 1), 1, (0, 0)),
            (f"{name}.branch7x7_1", 768, c7, (1, 1), 1, (0, 0)),
            (f"{name}.branch7x7_2", c7, c7, (1, 7), 1, (0, 3)),
            (f"{name}.branch7x7_3", c7, 192, (7, 1), 1, (3, 0)),
            (f"{name}.branch7x7dbl_1", 768, c7, (1, 1), 1, (0, 0)),
            (f"{name}.branch7x7dbl_2", c7, c7, (7, 1), 1, (3, 0)),
            (f"{name}.branch7x7dbl_3", c7, c7, (1, 7), 1, (0, 3)),
            (f"{name}.branch7x7dbl_4", c7, c7, (7, 1), 1, (3, 0)),
            (f"{name}.branch7x7dbl_5", c7, 192, (1, 7), 1, (0, 3)),
            (f"{name}.branch_pool", 768, 192, (1, 1), 1, (0, 0)),
        ]

    specs += c_block("Mixed_6b", 128)
    specs += c_block("Mixed_6c", 160)
    specs += c_block("Mixed_6d", 160)
    specs += c_block("Mixed_6e", 192)

    specs += [  # InceptionD (Mixed_7a)
        ("Mixed_7a.branch3x3_1", 768, 192, (1, 1), 1, (0, 0)),
        ("Mixed_7a.branch3x3_2", 192, 320, (3, 3), 2, (0, 0)),
        ("Mixed_7a.branch7x7x3_1", 768, 192, (1, 1), 1, (0, 0)),
        ("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7), 1, (0, 3)),
        ("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1), 1, (3, 0)),
        ("Mixed_7a.branch7x7x3_4", 192, 192, (3, 3), 2, (0, 0)),
    ]

    def e_block(name, cin):
        return [
            (f"{name}.branch1x1", cin, 320, (1, 1), 1, (0, 0)),
            (f"{name}.branch3x3_1", cin, 384, (1, 1), 1, (0, 0)),
            (f"{name}.branch3x3_2a", 384, 384, (1, 3), 1, (0, 1)),
            (f"{name}.branch3x3_2b", 384, 384, (3, 1), 1, (1, 0)),
            (f"{name}.branch3x3dbl_1", cin, 448, (1, 1), 1, (0, 0)),
            (f"{name}.branch3x3dbl_2", 448, 384, (3, 3), 1, (1, 1)),
            (f"{name}.branch3x3dbl_3a", 384, 384, (1, 3), 1, (0, 1)),
            (f"{name}.branch3x3dbl_3b", 384, 384, (3, 1), 1, (1, 0)),
            (f"{name}.branch_pool", cin, 192, (1, 1), 1, (0, 0)),
        ]

    specs += e_block("Mixed_7b", 1280)
    specs += e_block("Mixed_7c", 2048)
    return specs


# ---------------------------------------------------------------------------
# functional forward
# ---------------------------------------------------------------------------

def _bconv(params: Dict, name: str, x: jnp.ndarray, stride: int,
           pad: Tuple[int, int]) -> jnp.ndarray:
    """BasicConv2d: conv (no bias) + BatchNorm(eps=1e-3) + relu."""
    p = params[name]
    y = lax.conv_general_dilated(
        x, p["kernel"], (stride, stride),
        ((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = (y - p["bn_mean"]) * lax.rsqrt(p["bn_var"] + 1e-3)
    y = y * p["bn_scale"] + p["bn_bias"]
    return jax.nn.relu(y)


def _maxpool(x, k, s, p=0):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1),
                             ((0, 0), (p, p), (p, p), (0, 0)))


def _avgpool_tf(x, k=3, s=1, p=1):
    """avg_pool2d count_include_pad=False (the TF-parity FID patch)."""
    dims, strides = (1, k, k, 1), (1, s, s, 1)
    pad = ((0, 0), (p, p), (p, p), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, pad)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pad)
    return summed / counts


_SPEC_BY_NAME = {s[0]: s for s in _conv_specs()}


def _bc(params, x, name):
    _, _, _, _, stride, pad = _SPEC_BY_NAME[name]
    return _bconv(params, name, x, stride, pad)


def _inception_a(params, x, name):
    b1 = _bc(params, x, f"{name}.branch1x1")
    b5 = _bc(params, _bc(params, x, f"{name}.branch5x5_1"), f"{name}.branch5x5_2")
    b3 = _bc(params, x, f"{name}.branch3x3dbl_1")
    b3 = _bc(params, b3, f"{name}.branch3x3dbl_2")
    b3 = _bc(params, b3, f"{name}.branch3x3dbl_3")
    bp = _bc(params, _avgpool_tf(x), f"{name}.branch_pool")
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(params, x):  # Mixed_6a
    b3 = _bc(params, x, "Mixed_6a.branch3x3")
    bd = _bc(params, x, "Mixed_6a.branch3x3dbl_1")
    bd = _bc(params, bd, "Mixed_6a.branch3x3dbl_2")
    bd = _bc(params, bd, "Mixed_6a.branch3x3dbl_3")
    bp = _maxpool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(params, x, name):
    b1 = _bc(params, x, f"{name}.branch1x1")
    b7 = _bc(params, x, f"{name}.branch7x7_1")
    b7 = _bc(params, b7, f"{name}.branch7x7_2")
    b7 = _bc(params, b7, f"{name}.branch7x7_3")
    bd = _bc(params, x, f"{name}.branch7x7dbl_1")
    for i in (2, 3, 4, 5):
        bd = _bc(params, bd, f"{name}.branch7x7dbl_{i}")
    bp = _bc(params, _avgpool_tf(x), f"{name}.branch_pool")
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, x):  # Mixed_7a
    b3 = _bc(params, _bc(params, x, "Mixed_7a.branch3x3_1"), "Mixed_7a.branch3x3_2")
    b7 = _bc(params, x, "Mixed_7a.branch7x7x3_1")
    for i in (2, 3, 4):
        b7 = _bc(params, b7, f"Mixed_7a.branch7x7x3_{i}")
    bp = _maxpool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(params, x, name, pool_max: bool):
    b1 = _bc(params, x, f"{name}.branch1x1")
    b3 = _bc(params, x, f"{name}.branch3x3_1")
    b3 = jnp.concatenate([_bc(params, b3, f"{name}.branch3x3_2a"),
                          _bc(params, b3, f"{name}.branch3x3_2b")], axis=-1)
    bd = _bc(params, x, f"{name}.branch3x3dbl_1")
    bd = _bc(params, bd, f"{name}.branch3x3dbl_2")
    bd = jnp.concatenate([_bc(params, bd, f"{name}.branch3x3dbl_3a"),
                          _bc(params, bd, f"{name}.branch3x3dbl_3b")], axis=-1)
    pool = _maxpool(x, 3, 1, 1) if pool_max else _avgpool_tf(x)
    bp = _bc(params, pool, f"{name}.branch_pool")
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


POOL3_DIM = 2048  # Mixed_7c output channels = FID feature width


def inception_pool3(params: Dict, images: jnp.ndarray) -> jnp.ndarray:
    """images NHWC in [-1, 1] -> (B, 2048) pool3 activations.

    Matches inception_util.get_batch_activations: [-1,1] -> [0,1], then the
    model's resize to 299 bilinear + renormalize to [-1,1]."""
    x = (images.astype(jnp.float32) + 1.0) / 2.0
    x = resize2d(x, (299, 299), method="bilinear")
    x = 2.0 * x - 1.0

    x = _bc(params, x, "Conv2d_1a_3x3")
    x = _bc(params, x, "Conv2d_2a_3x3")
    x = _bc(params, x, "Conv2d_2b_3x3")
    x = _maxpool(x, 3, 2)
    x = _bc(params, x, "Conv2d_3b_1x1")
    x = _bc(params, x, "Conv2d_4a_3x3")
    x = _maxpool(x, 3, 2)
    x = _inception_a(params, x, "Mixed_5b")
    x = _inception_a(params, x, "Mixed_5c")
    x = _inception_a(params, x, "Mixed_5d")
    x = _inception_b(params, x)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params, x, name)
    x = _inception_d(params, x)
    x = _inception_e(params, x, "Mixed_7b", pool_max=False)
    x = _inception_e(params, x, "Mixed_7c", pool_max=True)
    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------

def load_inception_params(path: Optional[str] = None, seed: int = 0):
    """Returns (params, exact).  `path`: pt_inception-2015-12-05 state dict."""
    params: Dict = {}
    if path and os.path.exists(path):
        from deepsee_tpu.utils.torch_import import load_torch_checkpoint
        sd = {k: np.array(v) for k, v in load_torch_checkpoint(path).items()}
        for name, cin, cout, k, stride, pad in _conv_specs():
            params[name] = {
                "kernel": jnp.asarray(
                    sd[f"{name}.conv.weight"].transpose(2, 3, 1, 0)),
                "bn_scale": jnp.asarray(sd[f"{name}.bn.weight"]),
                "bn_bias": jnp.asarray(sd[f"{name}.bn.bias"]),
                "bn_mean": jnp.asarray(sd[f"{name}.bn.running_mean"]),
                "bn_var": jnp.asarray(sd[f"{name}.bn.running_var"]),
            }
        return params, True

    key = jax.random.PRNGKey(seed)
    for name, cin, cout, k, stride, pad in _conv_specs():
        key, k1 = jax.random.split(key)
        fan_in = cin * k[0] * k[1]
        params[name] = {
            "kernel": (jax.random.normal(k1, (k[0], k[1], cin, cout)) *
                       np.sqrt(2.0 / fan_in)).astype(jnp.float32),
            "bn_scale": jnp.ones((cout,), jnp.float32),
            "bn_bias": jnp.zeros((cout,), jnp.float32),
            "bn_mean": jnp.zeros((cout,), jnp.float32),
            "bn_var": jnp.ones((cout,), jnp.float32),
        }
    return params, False


# ---------------------------------------------------------------------------
# statistics + distance (host-side numpy/scipy, like the reference)
# ---------------------------------------------------------------------------

def calculate_statistics(activations: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, 2048) -> (mu, sigma) (inception_util.py:12-15)."""
    act = np.asarray(activations, dtype=np.float64)
    return np.mean(act, axis=0), np.cov(act, rowvar=False)


def _trace_sqrtm_product(sigma1: np.ndarray, sigma2: np.ndarray) -> float:
    """tr sqrtm(sigma1 @ sigma2) without forming the matrix square root.

    For PSD sigma2 = C C^T, eig(sigma1 sigma2) = eig(C^T sigma1 C) (eig(MN)
    = eig(NM) for square M, N), a symmetric PSD problem — the trace of the
    principal square root is the sum of the square roots of those
    eigenvalues.  Cholesky + two GEMMs + eigvalsh is ~5 n^3 FLOPs vs the
    ~28 n^3 of scipy's complex-Schur `sqrtm` (measured 18.4 s -> ~4 s on
    the 2048^2 Inception covariances, docs/bench_eval_r5.json).

    When sigma2 is numerically rank-deficient (fewer samples than features
    — scipy Cholesky fails), fall back to the symmetric square root via
    eigh: eig(sigma1 sigma2) = eig(B sigma1 B) with B = sigma2^{1/2},
    which needs no invertibility.  Negative eigenvalue noise is clipped at
    zero, matching the reference's `.real` handling of the principal sqrt
    (a negative real eigenvalue's square root is purely imaginary, so its
    real part — what fid_score.py:185-189 keeps — is zero).
    """
    try:
        chol = linalg.cholesky(sigma2, lower=True)
        inner = chol.T @ sigma1 @ chol
    except linalg.LinAlgError:
        w2, v2 = linalg.eigh(sigma2)
        root = (v2 * np.sqrt(np.clip(w2, 0.0, None))) @ v2.T
        inner = root @ sigma1 @ root
    eigs = linalg.eigvalsh((inner + inner.T) * 0.5)
    return float(np.sqrt(np.clip(eigs, 0.0, None)).sum())


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6,
                     method: str = "fast") -> float:
    """Stable Frechet distance (fid_score.py:138-192).

    method="fast" (default) computes tr sqrtm(s1 s2) by symmetric
    eigenvalues (`_trace_sqrtm_product`) — mathematically identical to the
    reference's scipy route and ~5x faster on the 2048^2 covariances;
    method="scipy" keeps the reference's literal `linalg.sqrtm` path
    (including its eps re-offset and imaginary-component guard).  Agreement
    of the two is locked by tests/test_eval_extras.py, including the
    rank-deficient small-sample regime.
    """
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    if method == "fast":
        tr_covmean = _trace_sqrtm_product(sigma1, sigma2)
    else:
        covmean = linalg.sqrtm(sigma1.dot(sigma2))  # may be complex/non-finite
        if not np.isfinite(covmean).all():
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
        if np.iscomplexobj(covmean):
            if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
                raise ValueError(
                    f"Imaginary component {np.max(np.abs(covmean.imag))}")
            covmean = covmean.real
        tr_covmean = float(np.trace(covmean))
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * tr_covmean)


def _fid_from_grams(act_fake: np.ndarray, act_real: np.ndarray) -> float:
    """FID straight from activations without forming D x D covariances.

    With centered activations A_i (n_i x D) and sigma_i = A_i^T A_i /
    (n_i - 1), the nonzero eigenvalues of sigma1 @ sigma2 equal those of
    (A1 A2^T)(A2 A1^T) / ((n1-1)(n2-1)) by the cyclic property, so
    tr sqrtm(sigma1 sigma2) is the NUCLEAR NORM of the n1 x n2 cross-Gram
    A1 A2^T / sqrt((n1-1)(n2-1)); tr sigma_i is a Frobenius norm.  For the
    realistic eval regime (n << 2048) this replaces two 2048^2
    decompositions with one tiny SVD: measured 10-17 s -> ~0.04 s at
    n=128 on this host, exact to ~1e-5 vs the f64 eigendecomposition
    route (it is the better-conditioned formulation of the same
    eigenproblem).  Same quantity as fid_score.py:138-192 computes."""
    a = np.asarray(act_fake, dtype=np.float64)
    b = np.asarray(act_real, dtype=np.float64)
    mu1, mu2 = a.mean(axis=0), b.mean(axis=0)
    ac, bc = a - mu1, b - mu2
    c1, c2 = a.shape[0] - 1.0, b.shape[0] - 1.0
    diff = mu1 - mu2
    tr1 = float((ac * ac).sum()) / c1
    tr2 = float((bc * bc).sum()) / c2
    sv = np.linalg.svd(ac @ bc.T, compute_uv=False)
    tr_covmean = float(sv.sum()) / np.sqrt(c1 * c2)
    return float(diff.dot(diff) + tr1 + tr2 - 2.0 * tr_covmean)


def fid_from_activations(act_fake: np.ndarray, act_real: np.ndarray,
                         method: str = "fast") -> float:
    act_fake = np.atleast_2d(np.asarray(act_fake))
    act_real = np.atleast_2d(np.asarray(act_real))
    n1, n2 = act_fake.shape[0], act_real.shape[0]
    dim = act_fake.shape[1]
    # Gram route whenever its SVD is no bigger than the covariance
    # eigenproblem it replaces (and sample counts admit n-1 divisors);
    # above that the D x D symmetric route of `frechet_distance` is cheaper.
    if method == "fast" and 2 <= min(n1, n2) and max(n1, n2) <= dim:
        return _fid_from_grams(act_fake, act_real)
    mu1, s1 = calculate_statistics(act_fake)
    mu2, s2 = calculate_statistics(act_real)
    return frechet_distance(mu1, s1, mu2, s2, method=method)
