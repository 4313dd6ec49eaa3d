"""On-device preprocessing: label one-hot + HR->LR synthesis.

TPU-native equivalent of the reference's `data/preprocessor.py` (which runs
`scatter_` one-hot at preprocessor.py:35-41 and bicubic `F.interpolate`
downsampling at preprocessor.py:17-33 on GPU).  Both ops are jit-compatible,
static-shape, and shard over the batch axis untouched.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from deepsee_tpu.ops.resize import resize2d

__all__ = ["one_hot_label", "downsample_image"]


def one_hot_label(label: jnp.ndarray, num_classes: int,
                  dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Integer label map -> one-hot semantics, channels-last.

    label: (B, H, W) or (B, H, W, 1) integer map in [0, num_classes-1]
    returns (B, H, W, num_classes); out-of-range labels produce all-zero rows
    (same net effect as the reference's scatter into a zeroed tensor,
    preprocessor.py:39-40).
    """
    if label.ndim == 4:
        label = label[..., 0]
    return jax.nn.one_hot(label.astype(jnp.int32), num_classes, dtype=dtype)


def downsample_image(hr_image: jnp.ndarray,
                     out_hw: Tuple[int, int],
                     method: str = "bicubic") -> jnp.ndarray:
    """HR image in [-1, 1] -> LR image in [-1, 1] (NHWC).

    Matches data/preprocessor.py:17-33: torch-convention interpolation
    (half-pixel, no antialias, cubic a=-0.75) followed by a clamp to kill
    bicubic overshoot.  The reference synthesizes every LR input from HR this
    way — there is no LR dataset on disk.
    """
    method = {"linear": "bilinear"}.get(method, method)
    lr = resize2d(hr_image, out_hw, method=method, antialias=False)
    return jnp.clip(lr, -1.0, 1.0)
