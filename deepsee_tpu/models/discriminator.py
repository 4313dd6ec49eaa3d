"""Multiscale PatchGAN discriminator (reference: networks/discriminator.py).

num_D NLayer discriminators; each coarser scale sees the input avg-pooled
(3x3, stride 2, count_include_pad=False).  Input = one-hot semantics
concatenated with the image (semantic_nc + output_nc channels).  Each NLayer
D returns all intermediate activations for the feature-matching loss.
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax.numpy as jnp

from deepsee_tpu.config import ModelConfig
from deepsee_tpu.models.layers import Conv2d, NonSpadeNormConv
from deepsee_tpu.ops.norms import leaky_relu
from deepsee_tpu.ops.pooling import avg_pool_3x3_s2

Dtype = Any


class NLayerDiscriminator(nn.Module):
    """4-layer PatchGAN (discriminator.py:67-120): 4x4 convs, stride 2
    (stride 1 on the last hidden layer), ndf -> min(2x, 512) channels,
    spectral+instance normalized except the first and final convs."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> List[jnp.ndarray]:
        cfg = self.cfg
        nf = cfg.ndf
        results = []

        y = leaky_relu(Conv2d(nf, (4, 4), (2, 2), (2, 2), dtype=self.dtype,
                              name="model0")(x.astype(self.dtype), train=train))
        results.append(y)

        for n in range(1, cfg.n_layers_d):
            nf = min(nf * 2, 512)
            stride = 1 if n == cfg.n_layers_d - 1 else 2
            y = leaky_relu(NonSpadeNormConv(nf, (4, 4), (stride, stride), (2, 2),
                                            norm=cfg.norm_d, dtype=self.dtype,
                                            name=f"model{n}")(y, train=train))
            results.append(y)

        y = Conv2d(1, (4, 4), (1, 1), (2, 2), dtype=self.dtype,
                   name=f"model{cfg.n_layers_d}")(y, train=train)
        results.append(y)
        return results


class MultiscaleDiscriminator(nn.Module):
    """num_D NLayer discriminators over progressively pooled inputs
    (discriminator.py:14-63).  Returns a list (per scale) of lists (per
    layer) of activations; the last entry of each inner list is the logit."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *,
                 train: bool = False) -> List[List[jnp.ndarray]]:
        out = []
        for i in range(self.cfg.num_d):
            out.append(NLayerDiscriminator(self.cfg, dtype=self.dtype,
                                           name=f"discriminator_{i}")(
                x, train=train))
            x = avg_pool_3x3_s2(x)
        return out
