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


class Pix2PixResnetBlock(nn.Module):
    """Plain pix2pixHD resblock (reference: ablation.py:13-29): two
    reflection-padded 3x3 spectral+instance-normed convs with ReLU."""

    dim: int
    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, seg=None, style=None, *,
                 train: bool = False) -> jnp.ndarray:
        from deepsee_tpu.models.layers import NonSpadeNormConv

        def pad_reflect(y):
            return jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                           mode="reflect")

        y = NonSpadeNormConv(self.dim, (3, 3), (1, 1), (0, 0),
                             norm="spectralinstance", dtype=self.dtype,
                             name="conv_block_0")(pad_reflect(x), train=train)
        y = nn.relu(y)
        y = NonSpadeNormConv(self.dim, (3, 3), (1, 1), (0, 0),
                             norm="spectralinstance", dtype=self.dtype,
                             name="conv_block_1")(pad_reflect(y), train=train)
        return x + y


class DeepSEEGenerator(nn.Module):
    """variant: "deepsee" (default) | "nostyle" | "nospade" | "puresean" —
    the paper's ablation generators (ablation.py:32,125,219): no style
    injection (plain SPADE blocks), no SPADE at all (pix2pixHD blocks), or
    all-PureSEAN blocks."""

    cfg: ModelConfig
    remat: bool = False
    # "full": recompute the whole block in backward (min memory, +1 G-fwd
    # FLOPs); "convs": save trunk conv outputs ("conv_out" names via
    # jax.checkpoint_policies.save_only_these_names), recompute norms/
    # resizes and the folded modulation convs ("mod_conv_out" — saving
    # those too exceeds HBM at 256^2 b16)
    remat_policy: str = "full"
    variant: str = "deepsee"

    @property
    def dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    def _block(self, name: str, styled: bool, puresean: bool):
        cfg = self.cfg
        nf16 = 16 * cfg.ngf
        if self.variant == "nospade":
            return Pix2PixResnetBlock(nf16, cfg, dtype=self.dtype, name=name)
        if self.variant == "nostyle":
            styled = False
        elif self.variant == "puresean":
            styled, puresean = True, True
        return SPADEResnetBlock(nf16, nf16, cfg, style=styled,
                                puresean=puresean, dtype=self.dtype, name=name)

    def _apply_block(self, blk, x, seg, style, train: bool):
        """Per-block rematerialization replaces the reference's --efficient
        torch.utils.checkpoint (architecture.py:95-122); `train` is closed
        over so nn.remat sees array args only."""
        if not self.remat:
            return blk(x, seg, style, train=train)

        def call(mdl, x, seg, style):
            return mdl(x, seg, style, train=train)

        policy = None
        if self.remat_policy == "convs":
            import jax
            policy = jax.checkpoint_policies.save_only_these_names("conv_out")
        return nn.remat(call, policy=policy)(blk, x, seg, style)

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

        x = Conv2d(nf16, (3, 3), padding=(1, 1), dtype=self.dtype,
                   name="initial")(lr_image.astype(self.dtype))

        x = self._apply_block(self._block("head_0", early_style, False),
                              x, seg, style, train)

        x = upsample_nearest_2x(x)
        x = self._apply_block(self._block("G_middle_0", True, False),
                              x, seg, style, train)
        x = self._apply_block(self._block("G_middle_1", True, False),
                              x, seg, style, train)

        # sr.py:42-52: cap of 4 full blocks for >=512px, PureSEAN beyond.
        max_full = 4 if cfg.load_size >= 512 else 99
        for i in range(n_blocks - 1):
            puresean = (i + 1) >= max_full
            x = upsample_nearest_2x(x)
            x = self._apply_block(self._block(f"up_{i}", True, puresean),
                                  x, seg, style, train)

        x = Conv2d(3, (3, 3), padding=(1, 1), dtype=self.dtype,
                   name="conv_img")(leaky_relu(x))
        return jnp.tanh(x.astype(jnp.float32))
