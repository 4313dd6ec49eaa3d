"""SPADE residual block (reference: networks/architecture.py:24-147).

Norm -> leaky-relu -> conv twice, with a (optionally learned) shortcut and
optional StyleGAN2 noise injection.  The reference's model-parallel
`split_location` plumbing (architecture.py:82-125) is intentionally absent:
device placement is a sharding concern handled by the mesh layer, not the
module graph.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from deepsee_tpu.config import ModelConfig
from deepsee_tpu.models.layers import Conv2d, NoiseInjection
from deepsee_tpu.models.normalization import SEANBlock, SPADE, PureSEANBlock
from deepsee_tpu.ops.norms import leaky_relu

Dtype = Any


class SPADEResnetBlock(nn.Module):
    fin: int
    fout: int
    cfg: ModelConfig
    style: bool = True
    puresean: bool = False
    dtype: Dtype = jnp.float32

    def _norm(self, norm_nc: int, name: str) -> nn.Module:
        # architecture.py:65-71 block selection
        spec = self.cfg.norm_g_spec
        if self.puresean:
            return PureSEANBlock(self.cfg, norm_nc, self.dtype, name=name)
        if self.style and spec.sean:
            return SEANBlock(self.cfg, norm_nc, self.dtype, name=name)
        return SPADE(self.cfg, norm_nc, self.dtype, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, seg: jnp.ndarray,
                 style: Optional[jnp.ndarray], *, train: bool) -> jnp.ndarray:
        cfg = self.cfg
        spectral = cfg.norm_g_spec.spectral
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout
        add_noise = cfg.add_noise and train  # architecture.py:60-63

        if add_noise:
            x = NoiseInjection(self.fin, name="noise_in")(x)

        # shortcut path (architecture.py:132-144)
        if learned_shortcut:
            x_skip = NoiseInjection(self.fin, name="noise_skip")(x) if add_noise else x
            x_s = self._norm(self.fin, "norm_s")(x_skip, seg, style, train=train)
            x_s = Conv2d(self.fout, (1, 1), padding=(0, 0), use_bias=False,
                         spectral=spectral, dtype=self.dtype,
                         name="conv_s")(x_s, train=train)
        else:
            x_s = NoiseInjection(self.fin, name="noise_skip")(x) if add_noise else x

        # main path
        dx = self._norm(self.fin, "norm_0")(x, seg, style, train=train)
        dx = Conv2d(fmiddle, (3, 3), padding=(1, 1), spectral=spectral,
                    dtype=self.dtype, name="conv_0")(leaky_relu(dx), train=train)
        if add_noise:
            dx = NoiseInjection(fmiddle, name="noise_middle")(dx)
        dx = self._norm(fmiddle, "norm_1")(dx, seg, style, train=train)
        dx = Conv2d(self.fout, (3, 3), padding=(1, 1), spectral=spectral,
                    dtype=self.dtype, name="conv_1")(leaky_relu(dx), train=train)

        return x_s + dx
