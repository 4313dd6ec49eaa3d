"""GAN, feature-matching, and perceptual losses (reference: networks/loss.py,
sr_model.py:518-564).

All pure functions over pytrees of discriminator outputs; loss math in
float32.  Discriminator outputs come as list[scale] of list[layer] arrays
with the final logit last (MultiscaleDiscriminator contract).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

DiscOut = List[List[jnp.ndarray]]


def _logit_loss(logit: jnp.ndarray, target_is_real: bool,
                for_discriminator: bool, mode: str) -> jnp.ndarray:
    """Per-scale loss on the final logit (loss.py:60-85)."""
    x = logit.astype(jnp.float32)
    if mode == "hinge":
        if for_discriminator:
            # -mean(min(±x - 1, 0)) == mean(relu(1 ∓ x))
            return jnp.mean(jax.nn.relu(1.0 - x) if target_is_real
                            else jax.nn.relu(1.0 + x))
        assert target_is_real, "G hinge loss aims for real (loss.py:77)"
        return -jnp.mean(x)
    if mode == "ls":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean(jnp.square(x - target))
    if mode == "original":
        target = jnp.full_like(x, 1.0 if target_is_real else 0.0)
        return jnp.mean(
            jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x))))
    if mode == "w":
        return -jnp.mean(x) if target_is_real else jnp.mean(x)
    raise ValueError(f"Unexpected gan_mode {mode}")


def gan_loss(pred: DiscOut, target_is_real: bool, *, mode: str = "hinge",
             for_discriminator: bool = True) -> jnp.ndarray:
    """Multiscale GAN loss, averaged over scales (loss.py:87-101: per scale
    the loss is computed on the last (logit) tensor, then divided by num_D)."""
    per_scale = [
        _logit_loss(scale[-1], target_is_real, for_discriminator, mode)
        for scale in pred
    ]
    return jnp.sum(jnp.stack(per_scale)) / len(pred)


def feature_matching_loss(pred_fake: DiscOut, pred_real: DiscOut,
                          lambda_feat: float = 10.0) -> jnp.ndarray:
    """Per-layer L1 between fake/real D features, real side detached
    (sr_model.py:529-539): sum over layers (logit excluded), * lambda / num_D."""
    num_d = len(pred_fake)
    total = jnp.float32(0.0)
    for fake_scale, real_scale in zip(pred_fake, pred_real):
        for f, r in zip(fake_scale[:-1], real_scale[:-1]):
            l1 = jnp.mean(jnp.abs(f.astype(jnp.float32) -
                                  jax.lax.stop_gradient(r.astype(jnp.float32))))
            total = total + l1 * (lambda_feat / num_d)
    return total


_VGG_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)  # loss.py:112


def vgg_loss(feats_x: Sequence[jnp.ndarray], feats_y: Sequence[jnp.ndarray],
             lambda_vgg: float = 10.0) -> jnp.ndarray:
    """Weighted L1 over the five VGG19 taps, y detached (loss.py:114-119)."""
    total = jnp.float32(0.0)
    for w, fx, fy in zip(_VGG_WEIGHTS, feats_x, feats_y):
        total = total + w * jnp.mean(
            jnp.abs(fx.astype(jnp.float32) -
                    jax.lax.stop_gradient(fy.astype(jnp.float32))))
    return total * lambda_vgg
