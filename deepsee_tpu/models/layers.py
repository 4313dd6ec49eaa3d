"""Foundational flax modules with exact torch semantics.

These are the building blocks the reference composes out of torch.nn:
Conv2d (optionally spectral-normalized, reference wraps with
torch.nn.utils.spectral_norm at architecture.py:40-44 and
normalization.py:29-31), BatchNorm with torch running-stat conventions
(replacing the vendored SynchronizedBatchNorm — cross-replica sync is free
here because jitted reductions over globally-sharded arrays are global), and
StyleGAN2 noise injection (normalization.py:289-304).

Conventions:
  * activations NHWC, conv kernels HWIO
  * params are float32; `dtype` is the compute dtype for convs
  * `train: bool` toggles batch-stat usage / power-iteration updates
  * mutable collections: "batch_stats" (running stats), "spectral" (u/v)
"""

from __future__ import annotations

import contextlib
import math
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax
from jax.ad_checkpoint import checkpoint_name

Dtype = Any

# -- int8 quantized inference (serving-only) ---------------------------------
# Trace-time switch consulted by Conv2d: wide convs run W8A8 symmetric
# quantized (per-output-channel weight scales, dynamic per-tensor activation
# scale) on the s8 MXU path, measured at 1.4-1.5x the bf16 conv throughput
# on v5e (scripts/probe_int8.py).  Training paths never quantize (Conv2d
# also requires train=False), and a jit traced outside the context stays
# full-precision — wrap the TRACE (jit/export call), not just the execution.
_INT8_MODE = {"on": False, "min_ch": 64, "smooth": True}


@contextlib.contextmanager
def int8_inference(min_ch: int = 64, smooth: bool = True):
    """Enable W8A8 quantized convs for functions TRACED inside this context.

    min_ch: quantize only convs with cin and cout both >= min_ch (narrow
    convs gain nothing on the 128-lane MXU and cost accuracy).
    smooth=False drops the SmoothQuant equalization (see _int8_conv): ~4%
    more throughput, -1.2 dB output parity, and weight quantization becomes
    input-independent (constant-foldable when weights are constants).

    jax.jit caches traces by function identity, so a function jitted BEFORE
    this context would silently serve its full-precision trace inside it
    (and vice versa).  The caches are cleared on entry and exit to make the
    mode switch airtight; serving export is a one-shot, the recompiles are
    irrelevant there.

    ONE-SHOT, SINGLE-THREADED ONLY: this flips a process-global flag and
    evicts EVERY compiled executable in the process (twice).  It is meant
    for the one-shot CLIs (bench --int8, export_serving --quantize int8,
    demo --int8).  In a long-lived multi-trace server, any unrelated
    function first traced while the context is open would be silently
    quantized, and concurrent threads would race on the flag — for that
    use case, export an int8 artifact ahead of time (serve.py) and load
    it instead of toggling this at runtime."""
    prev = dict(_INT8_MODE)
    jax.clear_caches()
    _INT8_MODE.update(on=True, min_ch=min_ch, smooth=smooth)
    try:
        yield
    finally:
        _INT8_MODE.clear()
        _INT8_MODE.update(prev)
        jax.clear_caches()


def int8_mode_active() -> bool:
    return _INT8_MODE["on"]


def _int8_conv(x: jnp.ndarray, kernel: jnp.ndarray,
               strides: Tuple[int, int], padding,
               smooth: bool = True) -> jnp.ndarray:
    """Symmetric W8A8 conv: s8 x s8 -> s32 on the MXU, dequantized to f32.

    Weight scales are per output channel; the activation scale is dynamic
    per tensor (no calibration pass needed).  `smooth` additionally folds a
    per-INPUT-channel equalizer s_c = max|x_c|^0.5 / max|k_c|^0.5 into the
    kernel (SmoothQuant, alpha=0.5: conv is linear per input channel, so
    x_c/s_c against k_c*s_c is exact in real arithmetic): after instance-
    norm/modulation the per-channel activation ranges differ widely, and a
    single tensor scale would crush the quiet channels; alpha=0.5 splits
    the range migration between x and k (measured: halves the quantization
    error on disparate ranges, exact no-op on uniform ones).  Smoothing
    makes the weight quantization data-dependent (not constant-foldable in
    an export), at the cost of two (cin,) reduces — negligible next to the
    conv."""
    x = x.astype(jnp.float32)
    if smooth:
        mx = jnp.maximum(jnp.max(jnp.abs(x), axis=(0, 1, 2)), 1e-8)
        mk = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 3)), 1e-8)
        s_c = jnp.sqrt(mx) / jnp.sqrt(mk)
        x = x / s_c
        kernel = kernel * s_c[None, None, :, None]
    s_k = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8) / 127.0
    k_q = jnp.clip(jnp.round(kernel / s_k), -127, 127).astype(jnp.int8)
    s_x = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(
        x_q, k_q, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s_x * s_k)


def xavier_normal_torch(gain: float = 0.02) -> Callable:
    """torch.nn.init.xavier_normal_ for HWIO conv kernels.

    std = gain * sqrt(2 / (fan_in + fan_out)) with fan_in = cin*kh*kw,
    fan_out = cout*kh*kw (reference init: base_network.py:40, gain 0.02).
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        fan_in, fan_out = cin * kh * kw, cout * kh * kw
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


def _l2_normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / (jnp.linalg.norm(v) + eps)


class Conv2d(nn.Module):
    """torch-parity Conv2d with optional spectral normalization.

    Spectral norm follows torch.nn.utils.spectral_norm exactly: weight
    flattened to (out, rest), one power iteration per training step updating
    buffers u (out,) and v (rest,), sigma = u . W v, W_used = W / sigma.
    Eval mode reuses the stored u/v without iterating.  sigma is invariant to
    the flatten order, so HWIO vs torch's OIHW layout changes only the
    (internal) permutation of v.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    spectral: bool = False
    dtype: Dtype = jnp.float32
    kernel_init: Callable = xavier_normal_torch(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, cin, self.features))

        if self.spectral:
            kernel = self._spectral_normalize(kernel, train)

        pad = ((self.padding[0], self.padding[0]),
               (self.padding[1], self.padding[1]))
        if (_INT8_MODE["on"] and not train
                and cin >= _INT8_MODE["min_ch"]
                and self.features >= _INT8_MODE["min_ch"]):
            y = _int8_conv(x, kernel, self.strides, pad,
                           smooth=_INT8_MODE["smooth"]).astype(self.dtype)
        else:
            y = lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=self.strides,
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        # named for selective rematerialization: the "convs" remat policy
        # saves these (the FLOP-heavy results) and recomputes only the cheap
        # norm/resize/modulation ops in the backward pass
        return checkpoint_name(y, "conv_out")

    def _spectral_normalize(self, kernel: jnp.ndarray, train: bool) -> jnp.ndarray:
        out = self.features
        rest = kernel.shape[0] * kernel.shape[1] * kernel.shape[2]
        w_mat = kernel.reshape(rest, out).T  # (out, rest)

        u_var = self.variable(
            "spectral", "u",
            lambda: _l2_normalize(
                jax.random.normal(self.make_rng("params"), (out,))))
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2_normalize(
                jax.random.normal(self.make_rng("params"), (rest,))))

        u, v = u_var.value, v_var.value
        if train:
            w_ng = lax.stop_gradient(w_mat)
            v = _l2_normalize(w_ng.T @ u)
            u = _l2_normalize(w_ng @ v)
            if not self.is_initializing():
                u_var.value, v_var.value = u, v
        sigma = jnp.einsum("o,or,r->", u, w_mat, v)
        return kernel / sigma


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with exact torch train/eval and running-stat semantics.

    train: normalize with the biased batch variance; update running stats
    with momentum 0.1 using the *unbiased* variance (torch convention).
    eval: normalize with running stats.  Under pjit the batch reductions are
    global across the data axis, giving SyncBN behavior with zero extra code
    (replaces sync_batchnorm/batchnorm.py:63-126).
    """

    features: int
    affine: bool = False
    eps: float = 1e-5
    momentum: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))

        # Statistics in float32 via reduction accumulation; elementwise math
        # stays in x.dtype (no materialized f32 activation copies).
        if train:
            mean = jnp.mean(x, axis=(0, 1, 2), dtype=jnp.float32)
            d = x - mean.astype(x.dtype)
            var = jnp.mean(jnp.square(d), axis=(0, 1, 2), dtype=jnp.float32)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * (n / max(1, n - 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = lax.rsqrt(var + self.eps)  # (C,), f32
        scale32 = inv
        offset32 = -mean * inv
        if self.affine:
            scale = self.param("scale", nn.initializers.normal(0.02, jnp.float32),
                               (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            # torch init_weights: BatchNorm weight ~ N(1.0, gain) (base_network.py:33)
            w = scale + 1.0
            scale32 = scale32 * w
            offset32 = offset32 * w + bias
        return x * scale32.astype(x.dtype) + offset32.astype(x.dtype)


class NoiseInjection(nn.Module):
    """x + w_c * N(0,1), per-channel learned weight initialized to zero.

    (reference: normalization.py:289-304, StyleGAN2 style; active only in
    training when --add_noise.)  Uses the "noise" rng stream.
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.zeros, (self.features,))
        if noise is None:
            noise = jax.random.normal(self.make_rng("noise"), x.shape,
                                      jnp.float32)
        return x + weight.astype(x.dtype) * noise.astype(x.dtype)


class NonSpadeNormConv(nn.Module):
    """The reference's `get_nonspade_norm_layer` applied to a conv.

    (normalization.py:19-54): optional spectral prefix, then one of
    none|instance|batch|sync_batch; conv bias is removed when a norm follows.
    Used throughout the encoders and discriminators.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    norm: str = "spectralinstance"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        from deepsee_tpu.config import parse_nonspade_norm
        from deepsee_tpu.ops.norms import instance_norm_2d

        spectral, sub = parse_nonspade_norm(self.norm)
        has_norm = sub != "none"
        y = Conv2d(self.features, self.kernel_size, self.strides, self.padding,
                   use_bias=not has_norm, spectral=spectral, dtype=self.dtype,
                   name="conv")(x, train=train)
        if sub == "instance":
            y = instance_norm_2d(y)
        elif sub in ("batch", "sync_batch"):
            y = TorchBatchNorm(self.features, affine=True, dtype=self.dtype,
                               name="norm")(y, train=train)
        return y
