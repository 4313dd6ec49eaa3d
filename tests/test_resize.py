"""Parity tests: deepsee_tpu resize ops vs torch F.interpolate / PIL."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

from deepsee_tpu.ops import resize2d, upsample_nearest_2x
from deepsee_tpu.ops.preprocess import downsample_image, one_hot_label


def _rand_nhwc(b, h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(b, h, w, c).astype(np.float32)


def _torch_interp(x_nhwc, size, mode):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    y = F.interpolate(t, size=size, mode=mode)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("mode,method", [
    ("nearest", "nearest"),
    ("bilinear", "bilinear"),
    ("bicubic", "bicubic"),
])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((256, 256), (32, 32)),   # HR->LR synthesis (preprocessor.py)
    ((16, 16), (128, 128)),   # baseline-mode upscale
    ((19, 23), (64, 48)),     # non-square, non-integer ratio
    ((64, 64), (64, 64)),     # identity
])
def test_torch_interpolate_parity(mode, method, in_hw, out_hw):
    x = _rand_nhwc(2, *in_hw, 3)
    want = _torch_interp(x, out_hw, mode)
    got = np.asarray(resize2d(jnp.asarray(x), out_hw, method=method))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_downsample_image_matches_reference_preprocessor():
    # data/preprocessor.py:17-33: bicubic downsample + clamp to [-1, 1]
    x = np.tanh(_rand_nhwc(2, 128, 128, 3, seed=1) * 2.0)  # in [-1, 1]
    want = _torch_interp(x, (16, 16), "bicubic").clip(-1, 1)
    got = np.asarray(downsample_image(jnp.asarray(x), (16, 16)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert got.min() >= -1.0 and got.max() <= 1.0


@pytest.mark.parametrize("in_hw,out_hw", [
    ((178, 178), (128, 128)),  # CelebA center-crop -> load_size
    ((512, 512), (256, 256)),
    ((100, 100), (256, 256)),  # upscale
])
def test_pil_bicubic_parity(in_hw, out_hw):
    # Compare against PIL's float path (mode 'F'), which is the exact
    # algorithm without the per-pass uint8 quantization PIL applies to RGB
    # images.  Host-side decode-time transforms use PIL itself (exact by
    # construction); this op covers on-device PIL-convention resizes.
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=in_hw).astype(np.float32)
    want = np.asarray(
        Image.fromarray(img, mode="F").resize(out_hw[::-1], Image.BICUBIC))
    x = jnp.asarray(img)[None, :, :, None]
    got = np.asarray(
        resize2d(x, out_hw, method="bicubic_pil", antialias=True))[0, :, :, 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)


def test_pil_nearest_parity():
    rng = np.random.RandomState(4)
    lab = rng.randint(0, 19, size=(512, 512), dtype=np.uint8)
    want = np.asarray(Image.fromarray(lab).resize((256, 256), Image.NEAREST))
    x = jnp.asarray(lab.astype(np.float32))[None, :, :, None]
    got = np.asarray(resize2d(x, (256, 256), method="nearest_pil"))[0, :, :, 0]
    np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_upsample_nearest_2x():
    x = _rand_nhwc(2, 8, 8, 5)
    want = _torch_interp(x, (16, 16), "nearest")
    got = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_one_hot_label_matches_scatter():
    # data/preprocessor.py:35-41
    rng = np.random.RandomState(5)
    lab = rng.randint(0, 19, size=(2, 8, 8)).astype(np.int64)
    t = torch.from_numpy(lab)[:, None]
    want = torch.zeros(2, 19, 8, 8).scatter_(1, t, 1.0).numpy()
    got = np.asarray(one_hot_label(jnp.asarray(lab), 19))
    np.testing.assert_array_equal(np.transpose(got, (0, 3, 1, 2)), want)
