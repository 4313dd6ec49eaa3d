"""Semantic modulation blocks: SPADE, SEAN, PureSEAN (NHWC flax modules).

Rebuilt from the behavior of deepsee_models/networks/normalization.py:71-304.

TPU-first notes:
  * The reference materializes the per-pixel style image by expanding
    style (B,19,S) and segmap (B,19,H,W) to a B x 19 x S x H x W tensor and
    reducing (normalization.py:182-185) — the single most memory-hungry op in
    the model and the reason for max_fm_size/model-parallel hacks.  Because
    the segmap is one-hot, that reduction is exactly a batched matmul:
    (B, H*W, 19) @ (B, 19, S) -> (B, H*W, S).  We express it as an einsum so
    XLA tiles it onto the MXU with no intermediate blowup.
  * All segmap resizes use torch-convention nearest (matmul-based, static).
  * `replicate_fm_resize_quirk`: when H > max_fm_size the reference
    re-upsamples and accidentally assigns interpolate(actv) to style_map too
    (normalization.py:188-190, 275-277).  Released 32x checkpoints were
    trained with this, so it is on by default; turning it off gives the
    intended style path.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

from deepsee_tpu.config import ModelConfig, NormGSpec
from deepsee_tpu.models.layers import (Conv2d, TorchBatchNorm,
                                       xavier_normal_torch)
from deepsee_tpu.ops.norms import instance_norm_2d
from deepsee_tpu.ops.resize import resize2d

Dtype = Any

_NHIDDEN = 128  # the reference's hardcoded embedding width (normalization.py:95)


class ConvParams(nn.Module):
    """Parameter container shaped exactly like a Conv2d so modulation convs
    can be weight-folded and fused (see SEANBlock) while keeping the param
    tree / checkpoint layout identical."""

    cin: int
    features: int
    ks: int = 3

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", xavier_normal_torch(0.02),
                            (self.ks, self.ks, self.cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _conv_raw(x, kernel, dtype, padding, train: bool = False):
    from deepsee_tpu.models.layers import _INT8_MODE, _int8_conv

    if (_INT8_MODE["on"] and not train
            and x.shape[-1] >= _INT8_MODE["min_ch"]
            and kernel.shape[-1] >= _INT8_MODE["min_ch"]):
        # serving-only W8A8 path (layers.int8_inference); like Conv2d, the
        # train gate keeps a training trace full-precision even if someone
        # opens the context around it (jnp.round has zero gradient)
        return _int8_conv(x, kernel, (1, 1), padding,
                          smooth=_INT8_MODE["smooth"]).astype(dtype)
    return lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv(x, kernel, bias, dtype, pad, train: bool = False):
    from jax.ad_checkpoint import checkpoint_name

    y = _conv_raw(x, kernel, dtype, ((pad, pad), (pad, pad)), train=train)
    # Deliberately NOT tagged "conv_out": the "convs" remat policy saves
    # trunk conv outputs only.  Saving these 2C-channel modulation outputs
    # too was measured to exceed HBM at 256^2 b16 (13.6 -> >16 GiB); their
    # recompute (~0.5x a trunk conv each) is part of the policy's price,
    # documented in config.py.  Own tag so a future policy can elect them.
    return checkpoint_name(y + bias.astype(dtype), "mod_conv_out")


# Fold matrix for _conv_on_nearest_up2: row s of the 4-tap transposed
# kernel sums the 3x3 taps (u) that read the same source pixel —
# W4[0]=K[0], W4[1]=K[0]+K[1], W4[2]=K[1]+K[2], W4[3]=K[2] per dimension.
# (np, not jnp: a module-level jnp constant would initialize the JAX
# backend at import time, locking the platform before entry points can
# pin CPU — the CLAUDE.md axon gotcha.  jnp ops accept numpy operands.)
_UP2_FOLD = np.asarray([[1.0, 0.0, 0.0],
                        [1.0, 1.0, 0.0],
                        [0.0, 1.0, 1.0],
                        [0.0, 0.0, 1.0]], dtype=np.float32)


def _conv_on_nearest_up2(a, kernel, bias, dtype, train: bool = False):
    """conv3x3(nearest_up2(a)) + bias, computed WITHOUT the upsample.

    The reference nearest-2x-upsamples the capped SEAN feature maps and
    then runs the 3x3 modulation convs on them (normalization.py:188-190 +
    :192-213).  nearest_up2 is a stride-2 transposed conv with a 2x2 ones
    kernel, so the composition is a single stride-2 transposed conv with
    the 4x4 composed kernel W[s,r] = sum_{u,v} F[s,u] F[r,v] K[u,v]
    (F = _UP2_FOLD): each output pixel reads exactly the 2x2 source pixels
    its 3x3 window touched, i.e. 4/9 of the MACs of conv-after-upsample,
    1/4 of the input reads, and the duplicated full-res map is never
    materialized.  Identical math in real arithmetic — tap sums happen in
    the kernels' f32 before the compute-dtype cast.

    MEASURED OFF by default for training (cfg.fold_upsampled_mod_conv
    gates it; see ARCHITECTURE.md "folded subpixel study").  Three
    formulations were benchmarked on the 512px b1 guided train step
    against the literal upsample-then-conv (320 ms): four phase convs +
    gather interleave (457 ms), this lhs-dilated conv (364 ms; forward
    phase alone 62.8 vs 57.7 ms), and one 2x2 conv with phase-stacked
    output channels + slice/stack interleave (538 ms).  The 4/9 MAC
    saving (~19 ms of MXU time) cannot pay for the
    layout-changing copies every fold forces at the HBM roof — XLA:TPU
    fuses the nearest-upsample broadcast into the conv input pipeline for
    free, so the literal form wins.  The lhs-dilated variant (the best of
    the three) is retained behind the flag.

    The int8 serving path keeps the literal upsample-then-conv
    (__int8_conv has no dilation support); bf16 paths take the fold when
    the flag is on.
    """
    from jax.ad_checkpoint import checkpoint_name

    from deepsee_tpu.models.layers import _INT8_MODE

    if (_INT8_MODE["on"] and not train
            and a.shape[-1] >= _INT8_MODE["min_ch"]
            and kernel.shape[-1] >= _INT8_MODE["min_ch"]):
        up = resize2d(a, (2 * a.shape[1], 2 * a.shape[2]), method="nearest")
        return _conv(up, kernel, bias, dtype, 1, train=train)

    fold = _UP2_FOLD.astype(kernel.dtype)
    w = jnp.einsum("su,rv,uvio->srio", fold, fold, kernel)
    y = lax.conv_general_dilated(
        a.astype(dtype), w.astype(dtype), (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return checkpoint_name(y + bias.astype(dtype), "mod_conv_out")


def style_to_pixels(segmap: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """One-hot segmap (B,H,W,N) x style matrix (B,N,S) -> style map (B,H,W,S).

    Exact replacement for the reference's expand-multiply-sum
    (normalization.py:182-185): for one-hot maps the sum over regions is a
    gather, which we compute as a batched matmul.

    With contain_dontcare_label the segmap has one extra channel; the
    dontcare region gets a zero style row (the reference simply crashes on
    this combination, normalization.py:182-185 shape mismatch).
    """
    if segmap.shape[-1] == style.shape[1] + 1:
        style = jnp.pad(style, ((0, 0), (0, 1), (0, 0)))
    return jnp.einsum("bhwn,bns->bhws", segmap, style)


class ParamFreeNorm(nn.Module):
    """The 'param-free' part of SPADE: instance | (sync)batch, affine=False."""

    features: int
    kind: str  # instance | syncbatch | batch
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        if self.kind == "instance":
            return instance_norm_2d(x)
        # syncbatch == batch under jit: reductions over the global batch.
        return TorchBatchNorm(self.features, affine=False, dtype=self.dtype,
                              name="param_free_norm")(x, train=train)


class SPADE(nn.Module):
    """Classic SPADE (normalization.py:71-120): y = norm(x)*(1+g) + b with
    g, b convolved from the nearest-resized one-hot segmap."""

    cfg: ModelConfig
    norm_nc: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, segmap: jnp.ndarray,
                 style: Optional[jnp.ndarray] = None, *,
                 train: bool) -> jnp.ndarray:
        spec = self.cfg.norm_g_spec
        ks = spec.kernel_size
        pad = (ks // 2, ks // 2)

        normalized = ParamFreeNorm(self.norm_nc, spec.param_free_kind,
                                   self.dtype, name="pfn")(x, train=train)

        seg = resize2d(segmap, x.shape[1:3], method="nearest")
        actv = nn.relu(Conv2d(_NHIDDEN, (ks, ks), padding=pad, dtype=self.dtype,
                              name="mlp_shared")(seg.astype(self.dtype)))

        # gamma/beta convs share their input, so run them as ONE conv with
        # 2*C outputs; fold the (1 + gamma) into the gamma bias.  Identical
        # math (conv is linear), half the kernel launches, and XLA fuses the
        # modulation into the conv epilogue.
        kg, bg = ConvParams(_NHIDDEN, self.norm_nc, ks, name="mlp_gamma")()
        kb, bb = ConvParams(_NHIDDEN, self.norm_nc, ks, name="mlp_beta")()
        kernel = jnp.concatenate([kg, kb], axis=3)
        bias = jnp.concatenate([bg + 1.0, bb])
        mod = _conv(actv, kernel, bias, self.dtype, ks // 2, train=train)
        c = self.norm_nc
        return normalized * mod[..., :c] + mod[..., c:]


class _SEANCore(nn.Module):
    """Shared machinery of SEAN_Block / PureSEAN_Block: capped-resolution
    segmap features + per-pixel style map (normalization.py:167-190,254-277)."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_hw: Tuple[int, int], segmap: jnp.ndarray,
                 style: jnp.ndarray):
        """Returns (actv, style_map, up2).  When up2 is True the maps are
        LOW-resolution (exactly half of x_hw) and the caller must run its
        modulation conv via _conv_on_nearest_up2 — same math as nearest-
        upsampling here, without ever materializing the duplicated map
        (the 512px hot path: fm capped at 256, activations at 512)."""
        cfg = self.cfg
        ks = cfg.norm_g_spec.kernel_size
        pad = (ks // 2, ks // 2)
        fm_hw = (min(x_hw[0], cfg.max_fm_size), min(x_hw[1], cfg.max_fm_size))

        seg = resize2d(segmap, fm_hw, method="nearest")
        actv = nn.relu(Conv2d(_NHIDDEN, (ks, ks), padding=pad, dtype=self.dtype,
                              name="mlp_shared")(seg.astype(self.dtype)))
        style_map = style_to_pixels(seg, style.astype(seg.dtype)).astype(self.dtype)

        up2 = False
        if fm_hw != tuple(x_hw):
            if (cfg.fold_upsampled_mod_conv and ks == 3
                    and tuple(x_hw) == (2 * fm_hw[0], 2 * fm_hw[1])):
                up2 = True
                if cfg.replicate_fm_resize_quirk:
                    style_map = actv
                return actv, style_map, up2
            actv = resize2d(actv, x_hw, method="nearest")
            if cfg.replicate_fm_resize_quirk:
                # normalization.py:190/:277 assigns interpolate(actv) to
                # style_map — requires regional_style_size == 128 (it is).
                style_map = actv
            else:
                style_map = resize2d(style_map, x_hw, method="nearest")
        return actv, style_map, up2


class SEANBlock(nn.Module):
    """SEAN (normalization.py:123-213): segmap-conditioned gamma/beta blended
    with style-conditioned gamma/beta by learned sigmoid weights."""

    cfg: ModelConfig
    norm_nc: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, segmap: jnp.ndarray,
                 style: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        cfg = self.cfg
        spec = cfg.norm_g_spec
        ks = spec.kernel_size

        normalized = ParamFreeNorm(self.norm_nc, spec.param_free_kind,
                                   self.dtype, name="pfn")(x, train=train)
        actv, style_map, up2 = _SEANCore(cfg, self.dtype, name="core")(
            x.shape[1:3], segmap, style)

        # torch init: nn.Parameter(torch.rand(1)) — uniform [0, 1)
        alpha_gamma = self.param("alpha_gamma", nn.initializers.uniform(1.0), (1,))
        alpha_beta = self.param("alpha_beta", nn.initializers.uniform(1.0), (1,))
        wg = nn.sigmoid(alpha_gamma)[0]
        wb = nn.sigmoid(alpha_beta)[0]

        # TPU-native fusion of the reference's 4 convs + sigmoid blend
        # (normalization.py:192-213): convolution is linear, so
        #   scale  = wg*conv(style; Kgs) + (1-wg)*conv(actv; Kg) + 1
        #          = conv(cat[actv, style]; cat[(1-wg)Kg, wg*Kgs]) + bias'
        # with the +1 folded into the bias — ONE conv with 2*C outputs over
        # the concatenated 2*NHIDDEN input instead of four convs and three
        # elementwise blends.  Exactly equal math, and the weight folding is
        # O(|K|) per step.
        kg, bg = ConvParams(_NHIDDEN, self.norm_nc, ks, name="mlp_gamma")()
        kb, bb = ConvParams(_NHIDDEN, self.norm_nc, ks, name="mlp_beta")()
        kgs, bgs = ConvParams(cfg.regional_style_size, self.norm_nc, ks,
                              name="mlp_style_gamma")()
        kbs, bbs = ConvParams(cfg.regional_style_size, self.norm_nc, ks,
                              name="mlp_style_beta")()

        k_scale = jnp.concatenate([(1.0 - wg) * kg, wg * kgs], axis=2)
        k_offset = jnp.concatenate([(1.0 - wb) * kb, wb * kbs], axis=2)
        kernel = jnp.concatenate([k_scale, k_offset], axis=3)
        bias = jnp.concatenate([(1.0 - wg) * bg + wg * bgs + 1.0,
                                (1.0 - wb) * bb + wb * bbs])

        inp = jnp.concatenate([actv, style_map], axis=-1)
        mod = (_conv_on_nearest_up2(inp, kernel, bias, self.dtype, train=train)
               if up2 else
               _conv(inp, kernel, bias, self.dtype, ks // 2, train=train))
        c = self.norm_nc
        return normalized * mod[..., :c] + mod[..., c:]


class PureSEANBlock(nn.Module):
    """Style-only SEAN (normalization.py:216-286): y = norm(x)*g_s + b_s.
    Used for the top-resolution blocks of >=512px models to save memory."""

    cfg: ModelConfig
    norm_nc: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, segmap: jnp.ndarray,
                 style: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        cfg = self.cfg
        spec = cfg.norm_g_spec
        ks = spec.kernel_size

        normalized = ParamFreeNorm(self.norm_nc, spec.param_free_kind,
                                   self.dtype, name="pfn")(x, train=train)
        _, style_map, up2 = _SEANCore(cfg, self.dtype, name="core")(
            x.shape[1:3], segmap, style)

        # gamma_s/beta_s share their input: one conv with 2*C outputs
        kgs, bgs = ConvParams(cfg.regional_style_size, self.norm_nc, ks,
                              name="mlp_style_gamma")()
        kbs, bbs = ConvParams(cfg.regional_style_size, self.norm_nc, ks,
                              name="mlp_style_beta")()
        kernel = jnp.concatenate([kgs, kbs], axis=3)
        bias = jnp.concatenate([bgs, bbs])
        mod = (_conv_on_nearest_up2(style_map, kernel, bias, self.dtype,
                                    train=train)
               if up2 else
               _conv(style_map, kernel, bias, self.dtype, ks // 2,
                     train=train))
        c = self.norm_nc
        return normalized * mod[..., :c] + mod[..., c:]
