"""Image resizing with exact torch-`F.interpolate` / PIL semantics, TPU-native.

The reference resizes in two places with two different conventions:

  * on-device `F.interpolate` calls: HR->LR bicubic downsampling
    (data/preprocessor.py:29-31), nearest segmap resizes inside SPADE/SEAN
    (normalization.py:110,174,261), bilinear/bicubic inference upscales.
    torch conventions: half-pixel centers, NO antialiasing, cubic a = -0.75,
    nearest src = floor(dst * in/out).
  * host-side PIL transforms at load time (data/base_dataset.py:171-201):
    PIL conventions: antialiased sampling when downscaling, cubic a = -0.5,
    normalized weights, nearest src = floor((dst+0.5) * in/out).

Bit-level parity here dominates the PSNR comparisons against the reference, so
both families are implemented exactly.

TPU-first design: for static in/out sizes a 1-D resize is a small dense matrix
multiply; a 2-D resize is two of them (separable).  We precompute the
(out, in) weight matrix with numpy at trace time and contract with einsum so
XLA maps it onto the MXU — no gathers, no dynamic shapes, trivially shardable
(the matrices are replicated; batch/channel dims stay sharded).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["resize_matrix", "resize2d", "upsample_nearest_2x"]


# ---------------------------------------------------------------------------
# filter kernels
# ---------------------------------------------------------------------------

def _cubic(x: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic convolution kernel with free parameter `a`.

    torch bicubic uses a=-0.75 (aten/src/ATen/native/UpSample.h), PIL a=-0.5.
    """
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _linear(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


def _box(x: np.ndarray) -> np.ndarray:
    return np.where((x >= -0.5) & (x < 0.5), 1.0, 0.0)


_FILTERS = {
    # name: (fn, support)
    "bilinear": (_linear, 1.0),
    "linear": (_linear, 1.0),
    "bicubic": (functools.partial(_cubic, a=-0.75), 2.0),      # torch
    "bicubic_pil": (functools.partial(_cubic, a=-0.5), 2.0),    # PIL
    "box": (_box, 0.5),
}


# ---------------------------------------------------------------------------
# weight-matrix construction (host-side numpy; cached per static signature)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def resize_matrix(in_size: int, out_size: int, method: str = "bicubic",
                  antialias: bool = False) -> np.ndarray:
    """Dense (out_size, in_size) float32 resampling matrix.

    method:
      nearest       torch F.interpolate(mode='nearest'):   src = floor(dst*s)
      nearest_pil   PIL NEAREST:                           src = floor((dst+.5)*s)
      bilinear      torch half-pixel linear, border-replicating
      bicubic       torch half-pixel cubic a=-0.75, border-replicating
      bicubic_pil   cubic a=-0.5 (PIL); combine with antialias=True for
                    PIL.Image.resize parity
      box           area averaging

    antialias: stretch the kernel by the scale factor when downscaling and
    normalize weights to sum 1 (PIL always does this; torch only when
    antialias=True).
    """
    if in_size == out_size and method.startswith(("nearest", "bilinear", "bicubic")):
        return np.eye(out_size, dtype=np.float32)

    scale = in_size / out_size
    mat = np.zeros((out_size, in_size), dtype=np.float64)

    if method == "nearest":
        src = np.minimum((np.arange(out_size) * scale).astype(np.int64), in_size - 1)
        mat[np.arange(out_size), src] = 1.0
        return mat.astype(np.float32)
    if method == "nearest_pil":
        src = np.minimum(((np.arange(out_size) + 0.5) * scale).astype(np.int64),
                         in_size - 1)
        mat[np.arange(out_size), src] = 1.0
        return mat.astype(np.float32)

    fn, support = _FILTERS[method]

    if antialias:
        # PIL convention (Pillow Resample.c precompute_coeffs): kernel
        # stretched by the scale when downscaling, taps clipped to the image
        # and weights renormalized over the *clipped* window (no border
        # replication).
        filterscale = max(scale, 1.0)
        supp = support * filterscale
        for o in range(out_size):
            center = (o + 0.5) * scale
            xmin = max(0, int(center - supp + 0.5))
            xmax = min(in_size, int(center + supp + 0.5))
            taps = np.arange(xmin, xmax)
            w = fn((taps - center + 0.5) / filterscale)
            s = w.sum()
            if s != 0.0:
                w = w / s
            mat[o, xmin:xmax] = w
        return mat.astype(np.float32)

    # torch convention: half-pixel centers, unscaled kernel, border-replicate
    # (out-of-range taps accumulate onto the edge pixels).
    for o in range(out_size):
        center = (o + 0.5) * scale - 0.5
        lo = int(np.floor(center - support)) + 1
        hi = int(np.floor(center + support)) + 1
        taps = np.arange(lo, hi + 1)
        w = fn(taps - center)
        idx = np.clip(taps, 0, in_size - 1)
        np.add.at(mat[o], idx, w)

    # half-pixel kernels sum to 1 exactly; renormalize for float safety
    rs = mat.sum(axis=1, keepdims=True)
    mat = mat / np.where(rs == 0.0, 1.0, rs)
    return mat.astype(np.float32)


# ---------------------------------------------------------------------------
# application
# ---------------------------------------------------------------------------

def resize2d(x: jnp.ndarray, out_hw: Tuple[int, int], method: str = "bicubic",
             antialias: bool = False) -> jnp.ndarray:
    """Resize NHWC (or HWC) images to `out_hw` with the given convention.

    Computation runs in float32 for accuracy and is cast back to x.dtype.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    oh, ow = out_hw
    orig_dtype = x.dtype
    y = x.astype(jnp.float32)
    if h != oh:
        mh = jnp.asarray(resize_matrix(h, oh, method, antialias))
        y = jnp.einsum("oh,bhwc->bowc", mh, y)
    if w != ow:
        mw = jnp.asarray(resize_matrix(w, ow, method, antialias))
        y = jnp.einsum("ow,bhwc->bhoc", mw, y)
    y = y.astype(orig_dtype)
    return y[0] if squeeze else y


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbor upsample of NHWC, as used between generator blocks.

    (reference: nn.Upsample(scale_factor=2), networks/sr.py:57,87)
    Implemented as reshape+broadcast — a pure layout change XLA fuses into the
    surrounding ops; no gather, no matmul.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
