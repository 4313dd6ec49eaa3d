"""Style encoders producing the (B, label_nc, style_size) regional style matrix.

Rebuilt from deepsee_models/networks/encoder.py:

  * FullStyleEncoder (:73-132) — HR input, two stride-2 downs, one
    upsample+conv (SEAN-paper style, transposed-conv-free).
  * MiniStyleEncoder (:135-175) — LR (start_size) input, stride-1 convs plus
    one upsample+conv.
  * CombinedStyleEncoder (:178-210) — both trunks sharing one `final` head;
    the "independent" model.  "fullstyle" alone = the "guided" model.

Style-matrix extraction (:36-49): tanh features are masked by the one-hot
segmap and averaged over ALL pixels (divide by H*W, not region size) — here a
single einsum (batched matmul over the region axis).

Learned per-region style noise (:51-70): sigmoid(noise_weights) gated noise,
clamped to [-1, 1]; the reference's "normal" branch applies (randn*2-1)*scale
(a quirk, replicated).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepsee_tpu.config import ModelConfig
from deepsee_tpu.models.layers import NonSpadeNormConv
from deepsee_tpu.ops.norms import leaky_relu
from deepsee_tpu.ops.resize import resize2d, upsample_nearest_2x

Dtype = Any


def extract_style_matrix(x: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) features x (B,Hs,Ws,N) one-hot -> (B,N,C) style matrix.

    encoder.py:36-49: seg nearest-resized to the feature resolution, masked
    mean over all pixels.
    """
    if seg.shape[1:3] != x.shape[1:3]:
        seg = resize2d(seg, x.shape[1:3], method="nearest")
    hw = x.shape[1] * x.shape[2]
    return jnp.einsum("bhwc,bhwn->bnc", x.astype(jnp.float32),
                      seg.astype(jnp.float32)) / hw


class _StyleNoise(nn.Module):
    """corrupt_style_matrix (encoder.py:51-70) with learned region weights."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, style: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        weights = self.param("noise_weights", nn.initializers.zeros,
                             (cfg.label_nc,))
        w = nn.sigmoid(weights)[None, :, None]
        key = self.make_rng("noise")
        scale = cfg.noisy_style_scale
        if cfg.noisy_style_dist == "uniform":
            noise = (jax.random.uniform(key, style.shape) * 2.0 - 1.0) * scale
        elif cfg.noisy_style_dist == "normal":
            # encoder.py:63-64 applies (randn*2 - 1) * scale verbatim
            noise = (jax.random.normal(key, style.shape) * 2.0 - 1.0) * scale
        else:
            raise ValueError(cfg.noisy_style_dist)
        return jnp.clip(style + noise * w, -1.0, 1.0)


class _FinalHead(nn.Module):
    """Shared `final` head: norm_layer(conv nf*8 -> style_size) + tanh."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        y = NonSpadeNormConv(self.cfg.regional_style_size, (3, 3), (1, 1),
                             (1, 1), norm=self.cfg.norm_e, dtype=self.dtype,
                             name="conv")(x, train=train)
        return jnp.tanh(y.astype(jnp.float32))


class FullTrunk(nn.Module):
    """HR trunk: initial s1, down0 s2, down1 s2, upsample+conv (encoder.py:82-99)."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        nf, ne = self.cfg.nef, self.cfg.norm_e
        y = leaky_relu(NonSpadeNormConv(nf, (3, 3), (1, 1), (1, 1), norm=ne,
                                        dtype=self.dtype,
                                        name="initial")(x, train=train))
        y = leaky_relu(NonSpadeNormConv(nf * 2, (3, 3), (2, 2), (1, 1), norm=ne,
                                        dtype=self.dtype,
                                        name="down0")(y, train=train))
        y = leaky_relu(NonSpadeNormConv(nf * 4, (3, 3), (2, 2), (1, 1), norm=ne,
                                        dtype=self.dtype,
                                        name="down1")(y, train=train))
        y = upsample_nearest_2x(y)
        y = leaky_relu(NonSpadeNormConv(nf * 8, (3, 3), (1, 1), (1, 1), norm=ne,
                                        dtype=self.dtype,
                                        name="up_conv")(y, train=train))
        return y


class MiniTrunk(nn.Module):
    """LR trunk: three s1 convs + upsample+conv (encoder.py:141-158)."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        nf, ne = self.cfg.nef, self.cfg.norm_e
        y = leaky_relu(NonSpadeNormConv(nf, (3, 3), (1, 1), (1, 1), norm=ne,
                                        dtype=self.dtype,
                                        name="initial")(x, train=train))
        y = leaky_relu(NonSpadeNormConv(nf * 2, (3, 3), (1, 1), (1, 1), norm=ne,
                                        dtype=self.dtype,
                                        name="conv0")(y, train=train))
        y = leaky_relu(NonSpadeNormConv(nf * 4, (3, 3), (1, 1), (1, 1), norm=ne,
                                        dtype=self.dtype,
                                        name="conv1")(y, train=train))
        y = upsample_nearest_2x(y)
        y = leaky_relu(NonSpadeNormConv(nf * 8, (3, 3), (1, 1), (1, 1), norm=ne,
                                        dtype=self.dtype,
                                        name="conv2")(y, train=train))
        return y


class FullStyleEncoder(nn.Module):
    """Standalone HR encoder — the "guided" model's netE (encoder.py:73-132)."""

    cfg: ModelConfig
    with_noise: bool = True   # "fullstyle" in netE and noisy_style_scale > 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray], seg: jnp.ndarray, *,
                 no_noise: jnp.ndarray | bool = False,
                 train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.random_style_matrix:
            # encoder.py:118-120: random per-region maps masked by the segmap
            noise = jax.random.normal(
                self.make_rng("noise"),
                (seg.shape[0], cfg.crop_size, cfg.crop_size, seg.shape[-1]))
            x = noise * resize2d(seg, (cfg.crop_size, cfg.crop_size),
                                 method="nearest")
        y = FullTrunk(cfg, self.dtype, name="trunk")(x.astype(self.dtype),
                                                     train=train)
        y = _FinalHead(cfg, self.dtype, name="final")(y, train=train)
        style = extract_style_matrix(y, seg)
        # static no_noise=True (pure inference) skips the RNG entirely
        static_skip = isinstance(no_noise, bool) and no_noise
        if self.with_noise and cfg.noisy_style_scale > 0 and not static_skip:
            noisy = _StyleNoise(cfg, name="style_noise")(style)
            style = jnp.where(jnp.asarray(no_noise), style, noisy)
        return style


class MiniStyleEncoder(nn.Module):
    """Standalone LR encoder (encoder.py:135-175); never adds style noise."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, seg: jnp.ndarray, *,
                 no_noise: jnp.ndarray | bool = False,
                 train: bool = False) -> jnp.ndarray:
        y = MiniTrunk(self.cfg, self.dtype, name="trunk")(x.astype(self.dtype),
                                                          train=train)
        y = _FinalHead(self.cfg, self.dtype, name="final")(y, train=train)
        return extract_style_matrix(y, seg)


class CombinedStyleEncoder(nn.Module):
    """Both trunks + shared final head (encoder.py:178-210).

    `use_full` selects the trunk.  Unlike the reference's host-side branch,
    both trunks run and the result is selected with `where`, keeping one
    compiled graph for the 50%-full / 50%-mini training coin flip
    (sr_model.py:616); the trunks are ~2% of generator FLOPs.  Spectral-norm
    power iteration depends only on weights, so updating both trunks every
    step is equivalent.
    """

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_full: jnp.ndarray, seg_full: jnp.ndarray,
                 x_mini: jnp.ndarray, seg_mini: jnp.ndarray,
                 use_full: jnp.ndarray | bool, *,
                 no_noise: jnp.ndarray | bool = False,
                 train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        head = _FinalHead(cfg, self.dtype, name="final")

        # With a static use_full (pure inference), skip the unused trunk
        # entirely; during init/training both run (training flips a traced
        # coin, and init must materialize both trunks' params).
        static = isinstance(use_full, bool) and not self.is_initializing()
        run_full = (not static) or use_full
        run_mini = (not static) or not use_full

        s_full = s_mini = None
        if run_full:
            y_full = FullTrunk(cfg, self.dtype, name="encoder_full")(
                x_full.astype(self.dtype), train=train)
            s_full = extract_style_matrix(head(y_full, train=train), seg_full)
        if run_mini:
            y_mini = MiniTrunk(cfg, self.dtype, name="encoder_mini")(
                x_mini.astype(self.dtype), train=train)
            s_mini = extract_style_matrix(head(y_mini, train=train), seg_mini)

        if static:
            style = s_full if use_full else s_mini
        else:
            style = jnp.where(jnp.asarray(use_full), s_full, s_mini)

        static_skip = isinstance(no_noise, bool) and no_noise
        if cfg.noisy_style_scale > 0 and not static_skip:
            noisy = _StyleNoise(cfg, name="style_noise")(style)
            style = jnp.where(jnp.asarray(no_noise), style, noisy)
        return style


def build_encoder(cfg: ModelConfig, dtype=jnp.float32) -> nn.Module:
    """netE factory (networks/__init__.py:56-58 + sr_model.py:28)."""
    if cfg.net_e == "combinedstyle":
        return CombinedStyleEncoder(cfg, dtype=dtype)
    if cfg.net_e == "fullstyle":
        return FullStyleEncoder(cfg, dtype=dtype)
    raise ValueError(f"Unknown netE: {cfg.net_e!r}")
