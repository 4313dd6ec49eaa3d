"""VGG19 feature extractor for the perceptual loss (reference:
networks/architecture.py:151-181, loss.py:105-119).

Emits [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1] — the reference's five
torchvision slices.  Like the reference (a SPADE inheritance), images are fed
in [-1, 1] *without* ImageNet mean/std normalization.

Pretrained weights: no torchvision in this environment, so weights are loaded
from a file when available (`load_vgg19_npz` / torchvision-format .pth via
utils.torch_import.load_torch_checkpoint) and fall back to fixed random
features otherwise — still a valid (if weaker) perceptual metric, and enough
for shape/grad tests.
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

Dtype = Any

# channels per conv, with 'M' = 2x2/s2 max-pool (standard VGG19 'E' config)
_VGG19_LAYOUT = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                 512, 512, 512, 512, "M", 512, 512, 512, 512, "M")
# indices (in conv count) after which we tap the feature: relu{1..5}_1
_TAP_AFTER_CONV = (1, 3, 5, 9, 13)  # 1-indexed conv counter values


def _max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1),
                             ((0, 0), (0, 0), (0, 0), (0, 0)))


class VGG19Features(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        conv_i = 0
        y = x.astype(self.dtype)
        for spec in _VGG19_LAYOUT:
            if spec == "M":
                y = _max_pool_2x2(y)
                continue
            kernel = self.param(f"conv{conv_i}_kernel",
                                nn.initializers.he_normal(),
                                (3, 3, y.shape[-1], spec))
            bias = self.param(f"conv{conv_i}_bias", nn.initializers.zeros,
                              (spec,))
            y = lax.conv_general_dilated(
                y, kernel.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias.astype(self.dtype)
            y = nn.relu(y)
            conv_i += 1
            if conv_i in _TAP_AFTER_CONV:
                taps.append(y)
            if conv_i == _TAP_AFTER_CONV[-1]:
                break  # nothing past relu5_1 is used
        return taps


def load_vgg19_params(path: str) -> dict:
    """Load VGG19 conv weights into this module's param dict.

    Accepts a torchvision-format state dict (.pth, keys `features.N.weight`)
    or an .npz with the same keys.
    """
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        from deepsee_tpu.utils.torch_import import load_torch_checkpoint
        sd = load_torch_checkpoint(path)
        sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    # torchvision feature indices of the 13 convs through relu5_1 (the last
    # tapped feature, _TAP_AFTER_CONV[-1]); the tail past relu5_1 is unused
    conv_indices = [i for i, spec in enumerate(
        _expand_torchvision_indices()) if spec][:_TAP_AFTER_CONV[-1]]
    params = {}
    for ci, ti in enumerate(conv_indices):
        w = np.asarray(sd[f"features.{ti}.weight"])
        b = np.asarray(sd[f"features.{ti}.bias"])
        params[f"conv{ci}_kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        params[f"conv{ci}_bias"] = jnp.asarray(b)
    return params


def _expand_torchvision_indices():
    """Mark which torchvision `features` indices are convs.

    vgg19.features = [conv,relu]*2, pool, [conv,relu]*2, pool,
    [conv,relu]*4, pool, ... — conv at even offsets within blocks."""
    out = []
    for spec in _VGG19_LAYOUT:
        if spec == "M":
            out.append(False)      # MaxPool2d
        else:
            out.append(True)       # Conv2d
            out.append(False)      # ReLU
    return out
