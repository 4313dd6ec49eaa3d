"""Pooling primitives (NHWC)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["avg_pool_3x3_s2"]


def avg_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """F.avg_pool2d(kernel=3, stride=2, padding=1, count_include_pad=False).

    Used by MultiscaleDiscriminator to build the lower-resolution input
    (reference: discriminator.py:46-49).  count_include_pad=False means border
    windows divide by the number of *valid* taps, so we normalize a sum-pool
    by a ones-image sum-pool.
    """
    dims = (1, 3, 3, 1)
    strides = (1, 2, 2, 1)
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    x32 = x.astype(jnp.float32)
    summed = lax.reduce_window(x32, 0.0, lax.add, dims, strides, pad)
    ones = jnp.ones(x.shape[:3] + (1,), jnp.float32)
    counts = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pad)
    return (summed / counts).astype(x.dtype)
