"""Image-quality metrics with exact reference semantics, batched in JAX.

The reference computes (evaluator/evaluation.py:88-137):
  * RMSE on [-1, 1] tensors (per-sample mean MSE -> sqrt)
  * PSNR / SSIM on uint8-converted images via the MATLAB-parity BasicSR code
    (evaluator/calculate_PSNR_SSIM.py:71-122: gaussian 11x11 sigma 1.5,
    *valid* window, channel-wise then averaged)
  * MS-SSIM on [0, 255] floats via evaluator/ssim.py:24-118 — including its
    literal output formula `prod(mcs[:-1]**w[:-1] * mssim[-1]**w[-1])`, which
    raises the final-scale SSIM to w[-1] once per coarse level (a quirk of
    the reference; replicated because its reported numbers use it)
  * uint8 conversion via util/util.py:72-103 tensor2im: (x+1)/2*255, clip,
    truncate

All functions take NHWC batches and return per-sample values; everything is
jittable (one fused device sweep per eval batch instead of the reference's
per-sample python loops over cv2 calls).
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["to_uint8_values", "psnr", "ssim_matlab", "ms_ssim", "rmse",
           "MetricsAccumulator"]


def to_uint8_values(x: jnp.ndarray) -> jnp.ndarray:
    """tensor2im semantics, kept in float: (x+1)/2*255, clip, truncate."""
    y = (x.astype(jnp.float32) + 1.0) / 2.0 * 255.0
    return jnp.floor(jnp.clip(y, 0.0, 255.0))


def rmse(fake: jnp.ndarray, real: jnp.ndarray) -> jnp.ndarray:
    """Per-sample RMSE on [-1, 1] (evaluation.py:107-111)."""
    se = jnp.square(fake.astype(jnp.float32) - real.astype(jnp.float32))
    return jnp.sqrt(jnp.mean(se, axis=(1, 2, 3)))


def psnr(fake_255: jnp.ndarray, real_255: jnp.ndarray) -> jnp.ndarray:
    """Per-sample PSNR on [0,255] values (calculate_PSNR_SSIM.py:71-78)."""
    mse = jnp.mean(jnp.square(fake_255.astype(jnp.float32) -
                              real_255.astype(jnp.float32)), axis=(1, 2, 3))
    return jnp.where(mse == 0, jnp.inf,
                     20.0 * jnp.log10(255.0 / jnp.sqrt(mse)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_valid_filter(x: jnp.ndarray, window1d: np.ndarray) -> jnp.ndarray:
    """Separable valid 2-D gaussian filtering of NHWC, per channel."""
    c = x.shape[-1]
    w = jnp.asarray(window1d)
    kh = w.reshape(-1, 1, 1, 1) * jnp.ones((1, 1, 1, c))
    kw = w.reshape(1, -1, 1, 1) * jnp.ones((1, 1, 1, c))
    y = lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                 feature_group_count=c)
    return lax.conv_general_dilated(y, kw, (1, 1), "VALID",
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                    feature_group_count=c)


def _ssim_maps(img1: jnp.ndarray, img2: jnp.ndarray, window1d: np.ndarray,
               c1: float, c2: float):
    """Returns (ssim_map, cs_map) over the valid region, NHWC."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    mu1 = _depthwise_valid_filter(img1, window1d)
    mu2 = _depthwise_valid_filter(img2, window1d)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_valid_filter(img1 * img1, window1d) - mu1_sq
    sigma2_sq = _depthwise_valid_filter(img2 * img2, window1d) - mu2_sq
    sigma12 = _depthwise_valid_filter(img1 * img2, window1d) - mu1_mu2
    v1 = 2.0 * sigma12 + c2
    v2 = sigma1_sq + sigma2_sq + c2
    ssim_map = ((2.0 * mu1_mu2 + c1) * v1) / ((mu1_sq + mu2_sq + c1) * v2)
    return ssim_map, v1 / v2


def ssim_matlab(fake_255: jnp.ndarray, real_255: jnp.ndarray) -> jnp.ndarray:
    """Per-sample MATLAB-parity SSIM on [0,255] (calculate_PSNR_SSIM.py:81-122).

    The reference uses reflect-padded cv2.filter2D then crops [5:-5], which
    equals a valid convolution; channels filtered independently, the map
    averaged over space and channels."""
    ssim_map, _ = _ssim_maps(fake_255, real_255, _gaussian_window(),
                             c1=(0.01 * 255) ** 2, c2=(0.03 * 255) ** 2)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


_MSSSIM_WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333],
                           np.float32)  # ssim.py:90


def _avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """F.avg_pool2d(kernel=2): stride 2, no padding, floor."""
    b, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2]
    s = lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                          ((0, 0),) * 4)
    return s / 4.0


def ms_ssim(fake_255: jnp.ndarray, real_255: jnp.ndarray,
            val_range: float = 255.0, levels: int = 5) -> jnp.ndarray:
    """Per-sample MS-SSIM exactly as evaluator/ssim.py:88-118.

    Per level: channel-wise valid-window SSIM; `cs` is the mean contrast
    term; images are 2x average-pooled between levels.  Output uses the
    reference's literal formula (see module docstring)."""
    c1 = (0.01 * val_range) ** 2
    c2 = (0.03 * val_range) ** 2
    window = _gaussian_window()
    x, y = fake_255.astype(jnp.float32), real_255.astype(jnp.float32)

    mssim: List[jnp.ndarray] = []
    mcs: List[jnp.ndarray] = []
    for lvl in range(levels):
        size = min(11, x.shape[1], x.shape[2])
        win = window if size == 11 else _gaussian_window(size)
        ssim_map, cs_map = _ssim_maps(x, y, win, c1, c2)
        # ssim.py:71-73 with size_average=True: plain means over everything
        mssim.append(jnp.mean(ssim_map, axis=(1, 2, 3)))
        mcs.append(jnp.mean(cs_map, axis=(1, 2, 3)))
        if lvl != levels - 1:
            x, y = _avg_pool_2x2(x), _avg_pool_2x2(y)

    w = jnp.asarray(_MSSSIM_WEIGHTS[:levels])
    mssim_s = jnp.stack(mssim, axis=-1)   # (B, levels)
    mcs_s = jnp.stack(mcs, axis=-1)
    pow1 = jnp.power(mcs_s, w)
    pow2 = jnp.power(mssim_s, w)
    # ssim.py:117: torch.prod(pow1[:-1] * pow2[-1])
    return jnp.prod(pow1[..., :-1] * pow2[..., -1:], axis=-1)


class MetricsAccumulator:
    """Collects per-sample metric values; mean/std like evaluation.py:139-156."""

    def __init__(self):
        self.buffers: Dict[str, List[float]] = {}

    def add(self, name: str, values) -> None:
        vals = np.atleast_1d(np.asarray(values)).tolist()
        self.buffers.setdefault(name, []).extend(vals)

    def add_batch(self, fake, real) -> None:
        """fake/real: NHWC in [-1, 1] (device or numpy)."""
        fake255 = to_uint8_values(fake)
        real255 = to_uint8_values(real)
        self.add("rmse", rmse(fake, real))
        self.add("psnr", psnr(fake255, real255))
        self.add("ssim", ssim_matlab(fake255, real255))
        # MS-SSIM uses the un-truncated [0,255] floats (evaluation.py:114,125)
        f255 = (jnp.asarray(fake).astype(jnp.float32) + 1.0) * 127.5
        r255 = (jnp.asarray(real).astype(jnp.float32) + 1.0) * 127.5
        self.add("ms_ssim", ms_ssim(f255, r255))

    @property
    def n_samples(self) -> int:
        return len(next(iter(self.buffers.values()), []))

    def result(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, vals in self.buffers.items():
            out[f"{name}/mean"] = float(np.mean(vals))
            out[f"{name}/std"] = float(np.std(vals))
        out["n_samples"] = self.n_samples
        return out
