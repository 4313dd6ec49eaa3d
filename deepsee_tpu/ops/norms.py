"""Stateless normalization primitives (NHWC).

The stateful ones (batch norm with running stats, spectral norm with power-
iteration state) are flax modules in deepsee_tpu/models/layers.py; this module
holds the pure functions they and the SPADE blocks share.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["instance_norm_2d", "leaky_relu"]


def instance_norm_2d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False), NHWC.

    torch semantics (nn.InstanceNorm2d defaults: eps=1e-5, affine=False,
    track_running_stats=False): per-sample, per-channel standardization over
    H and W using the biased variance, in both train and eval modes.
    Stats are computed in float32 regardless of input dtype.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return y.astype(x.dtype)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """F.leaky_relu with the reference's 2e-1 slope (architecture.py:147)."""
    return jnp.where(x >= 0, x, negative_slope * x)
