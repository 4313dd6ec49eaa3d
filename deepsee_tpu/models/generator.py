"""DeepSEE super-resolution generator (reference: networks/sr.py).

Constant 512-channel (16*ngf) trunk: initial 3x3 conv on the LR input, a head
block, two middle blocks after the first 2x upsample, then (n_blocks-1)
upsample+resblock stages, finishing with leaky-relu -> 3x3 conv -> tanh.
n_blocks = log2(crop_size) - log2(start_size) (sr.py:27).  For >=512px
outputs, blocks beyond index 4 are PureSEAN (sr.py:42-52).

TPU-first differences from the reference:
  * NHWC + bfloat16 trunk; upsampling is a reshape-broadcast, not a gather.
  * No model_parallel_mode `.cuda(n)` moves (sr.py:73-92): channel-sharding
    of the trunk over the mesh "model" axis replaces pipeline hacks; see
    deepsee_tpu/parallel.
  * Optional remat per block replaces --efficient torch checkpointing.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from deepsee_tpu.config import ModelConfig
from deepsee_tpu.models.blocks import SPADEResnetBlock
from deepsee_tpu.models.layers import Conv2d
from deepsee_tpu.ops.norms import leaky_relu
from deepsee_tpu.ops.resize import upsample_nearest_2x

Dtype = Any


class DeepSEEGenerator(nn.Module):
    cfg: ModelConfig
    remat: bool = False

    @property
    def dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    @nn.compact
    def __call__(self, lr_image: jnp.ndarray, seg: jnp.ndarray,
                 style: Optional[jnp.ndarray], *,
                 train: bool = False) -> jnp.ndarray:
        """lr_image (B,h,w,3) in [-1,1]; seg (B,H,W,semantic_nc) one-hot;
        style (B,label_nc,style_size) in [-1,1].  Returns (B,H,W,3)."""
        cfg = self.cfg
        nf16 = 16 * cfg.ngf
        n_blocks = cfg.n_blocks
        early_style = not cfg.norm_g_spec.late  # sr.py:33

        Block = SPADEResnetBlock
        if self.remat:
            Block = nn.remat(SPADEResnetBlock, static_argnums=())

        x = Conv2d(nf16, (3, 3), padding=(1, 1), dtype=self.dtype,
                   name="initial")(lr_image.astype(self.dtype))

        x = Block(nf16, nf16, cfg, style=early_style, dtype=self.dtype,
                  name="head_0")(x, seg, style, train=train)

        x = upsample_nearest_2x(x)
        x = Block(nf16, nf16, cfg, style=True, dtype=self.dtype,
                  name="G_middle_0")(x, seg, style, train=train)
        x = Block(nf16, nf16, cfg, style=True, dtype=self.dtype,
                  name="G_middle_1")(x, seg, style, train=train)

        # sr.py:42-52: cap of 4 full blocks for >=512px, PureSEAN beyond.
        max_full = 4 if cfg.load_size >= 512 else 99
        for i in range(n_blocks - 1):
            puresean = (i + 1) >= max_full
            x = upsample_nearest_2x(x)
            x = Block(nf16, nf16, cfg, style=True, puresean=puresean,
                      dtype=self.dtype,
                      name=f"up_{i}")(x, seg, style, train=train)

        x = Conv2d(3, (3, 3), padding=(1, 1), dtype=self.dtype,
                   name="conv_img")(leaky_relu(x))
        return jnp.tanh(x.astype(jnp.float32))
