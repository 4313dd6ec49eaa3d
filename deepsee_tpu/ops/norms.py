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

    Statistics accumulate in float32 (reduction-level, no materialized f32
    copy of the activation); elementwise math stays in x.dtype so bf16
    activations never blow up HBM with f32 temporaries.
    """
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    d = x - mean.astype(x.dtype)
    var = jnp.mean(jnp.square(d), axis=(1, 2), keepdims=True,
                   dtype=jnp.float32)
    return d * lax.rsqrt(var + eps).astype(x.dtype)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """F.leaky_relu with the reference's 2e-1 slope (architecture.py:147)."""
    return jnp.where(x >= 0, x, negative_slope * x)
