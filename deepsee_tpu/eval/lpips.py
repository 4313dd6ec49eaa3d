"""LPIPS (net-lin, alex) — Learned Perceptual Image Patch Similarity.

Rebuilt from evaluator/PerceptualSimilarity (networks_basic.py:24-123,
pretrained_networks.py:61-102, ps_util.py:10-12): version 0.1 scaling layer,
AlexNet feature taps after each of the five ReLUs, per-channel unit
normalization (eps 1e-10), squared diffs, learned 1x1 "lin" heads, spatial
average, sum over layers.

Weights:
  * lin heads: shipped with the reference at
    evaluator/PerceptualSimilarity/models/weights/v0.1/alex.pth — loaded by
    default (they are small calibration weights, i.e. data).
  * AlexNet backbone: torchvision pretrained weights are NOT in this
    environment; pass `alexnet_path` (torchvision alexnet state_dict) for
    exact LPIPS, else a deterministic random backbone is used — relative
    comparisons still work, absolute values differ from the published metric
    (the loader returns exact=False in that case).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

REFERENCE_LIN_WEIGHTS = (
    "/root/reference/evaluator/PerceptualSimilarity/models/weights/v0.1/alex.pth")

# (out_ch, kernel, stride, pad); maxpool(3,2) after taps 1 and 2
_ALEX_CONVS = ((64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
               (256, 3, 1, 1), (256, 3, 1, 1))
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, kernel, bias, stride, pad):
    y = lax.conv_general_dilated(
        x, kernel, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


def _maxpool_3x3_s2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                             ((0, 0), (0, 0), (0, 0), (0, 0)))


def alexnet_features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Five ReLU taps of torchvision AlexNet `features` (NHWC input)."""
    taps = []
    y = x
    for i, (_, _, stride, pad) in enumerate(_ALEX_CONVS):
        if i in (1, 2):  # maxpool before conv2 and conv3
            y = _maxpool_3x3_s2(y)
        y = jax.nn.relu(_conv(y, params[f"conv{i}_kernel"],
                              params[f"conv{i}_bias"], stride, pad))
        taps.append(y)
    return taps


def lpips(params: Dict, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """Per-sample LPIPS distance; img0/img1 NHWC in [-1, 1]."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    x0 = (img0.astype(jnp.float32) - shift) / scale
    x1 = (img1.astype(jnp.float32) - shift) / scale
    f0 = alexnet_features(params, x0)
    f1 = alexnet_features(params, x1)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        na = a / (jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True)) + 1e-10)
        nb = b / (jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True)) + 1e-10)
        d = jnp.square(na - nb)
        w = params[f"lin{i}"]  # (C,)
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def load_lpips_params(lin_path: Optional[str] = None,
                      alexnet_path: Optional[str] = None,
                      seed: int = 0):
    """Build the LPIPS parameter dict (see module docstring).

    Returns (params, exact): `exact` is False when any weights fell back to
    random/uniform init (published-metric parity not available)."""
    params: Dict = {}
    exact = True

    if alexnet_path and os.path.exists(alexnet_path):
        from deepsee_tpu.utils.torch_import import load_torch_checkpoint
        sd = load_torch_checkpoint(alexnet_path)
        conv_idx = (0, 3, 6, 8, 10)  # torchvision features indices
        for i, ti in enumerate(conv_idx):
            w = np.asarray(sd[f"features.{ti}.weight"])
            params[f"conv{i}_kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
            params[f"conv{i}_bias"] = jnp.asarray(
                np.asarray(sd[f"features.{ti}.bias"]))
    else:
        exact = False
        key = jax.random.PRNGKey(seed)
        cin = 3
        for i, (cout, k, _, _) in enumerate(_ALEX_CONVS):
            key, k1 = jax.random.split(key)
            fan_in = cin * k * k
            params[f"conv{i}_kernel"] = (
                jax.random.normal(k1, (k, k, cin, cout)) *
                np.sqrt(2.0 / fan_in)).astype(jnp.float32)
            params[f"conv{i}_bias"] = jnp.zeros((cout,), jnp.float32)
            cin = cout

    lin_path = lin_path or REFERENCE_LIN_WEIGHTS
    if os.path.exists(lin_path):
        from deepsee_tpu.utils.torch_import import load_torch_checkpoint
        sd = load_torch_checkpoint(lin_path)
        for i in range(5):
            w = np.asarray(sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
            params[f"lin{i}"] = jnp.asarray(w.reshape(-1))
    else:
        exact = False
        for i, (cout, _, _, _) in enumerate(_ALEX_CONVS):
            params[f"lin{i}"] = jnp.full((cout,), 1.0 / cout, jnp.float32)

    return params, exact
