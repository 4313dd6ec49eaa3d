"""Torch parity for the three ported perceptual networks (VERDICT r1 item 1).

torchvision is not installed here, so each test (a) hand-constructs a RANDOM
torchvision-format state dict, (b) runs a minimal torch replica built from
torch.nn.functional ops whose semantics are cited from the reference
(networks/architecture.py:151-181 VGG19 slices;
PerceptualSimilarity/models/networks_basic.py:24-123 + pretrained_networks.py
:61-102 LPIPS-alex; evaluator/pytorch_fid/inception.py:16-310 FID Inception),
and (c) asserts the JAX port — fed through the real weight-loading path —
matches.  This proves "exact when weights are provided" without any
downloads.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from deepsee_tpu.eval.fid import inception_pool3, load_inception_params  # noqa: E402
from deepsee_tpu.eval.lpips import (REFERENCE_LIN_WEIGHTS, load_lpips_params,  # noqa: E402
                                    lpips)
from deepsee_tpu.models.vgg import VGG19Features, load_vgg19_params  # noqa: E402


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(
        x_nhwc.transpose(0, 3, 1, 2)))


# ---------------------------------------------------------------------------
# VGG19 (reference: networks/architecture.py:151-181 — torchvision
# vgg19().features sliced at [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1])
# ---------------------------------------------------------------------------

# torchvision vgg19 'E' config: features module indices of each op
_VGG19_FEATURES = [  # (kind, tv_index, out_channels)
    ("conv", 0, 64), ("conv", 2, 64), ("pool", 4, None),
    ("conv", 5, 128), ("conv", 7, 128), ("pool", 9, None),
    ("conv", 10, 256), ("conv", 12, 256), ("conv", 14, 256),
    ("conv", 16, 256), ("pool", 18, None),
    ("conv", 19, 512), ("conv", 21, 512), ("conv", 23, 512),
    ("conv", 25, 512), ("pool", 27, None),
    ("conv", 28, 512), ("conv", 30, 512), ("conv", 32, 512),
    ("conv", 34, 512), ("pool", 36, None),
]
# features indices AFTER whose ReLU the reference slices tap
# (architecture.py:160-170: slices end at 2, 7, 12, 21, 30 -> relu{1..5}_1)
_VGG_TAP_AFTER_TV_INDEX = (0, 5, 10, 19, 28)


def _random_vgg19_state_dict(seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    cin = 3
    for kind, ti, cout in _VGG19_FEATURES:
        if kind != "conv":
            continue
        # He-scaled so activations stay O(1) through 13 conv layers — keeps
        # the comparison in a regime where atol is meaningful
        std = np.sqrt(2.0 / (cin * 9))
        sd[f"features.{ti}.weight"] = torch.from_numpy(
            (rng.randn(cout, cin, 3, 3) * std).astype(np.float32))
        sd[f"features.{ti}.bias"] = torch.from_numpy(
            rng.randn(cout).astype(np.float32) * 0.05)
        cin = cout
    return sd


def _torch_vgg19_taps(sd, x_nchw):
    taps = []
    y = x_nchw
    for kind, ti, _ in _VGG19_FEATURES:
        if kind == "pool":
            y = F.max_pool2d(y, 2, 2)
            continue
        y = F.relu(F.conv2d(y, sd[f"features.{ti}.weight"],
                            sd[f"features.{ti}.bias"], padding=1))
        if ti in _VGG_TAP_AFTER_TV_INDEX:
            taps.append(y)
        if ti == _VGG_TAP_AFTER_TV_INDEX[-1]:
            break
    return taps


def test_vgg19_port_matches_torch(tmp_path):
    sd = _random_vgg19_state_dict()
    path = os.path.join(str(tmp_path), "vgg19.pth")
    torch.save(sd, path)

    params = load_vgg19_params(path)
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    jax_taps = VGG19Features().apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        torch_taps = _torch_vgg19_taps(sd, _nchw(x))

    assert len(jax_taps) == len(torch_taps) == 5
    for i, (jt, tt) in enumerate(zip(jax_taps, torch_taps)):
        want = tt.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(jt), want, atol=2e-5, rtol=1e-5,
                                   err_msg=f"relu{i+1}_1 mismatch")


# ---------------------------------------------------------------------------
# LPIPS net-lin alex (reference: networks_basic.py PNetLin v0.1 +
# pretrained_networks.py alexnet slices; lin heads from the SHIPPED
# models/weights/v0.1/alex.pth — real calibration data, loaded in both paths)
# ---------------------------------------------------------------------------

# torchvision alexnet features: (tv_index, cout, kernel, stride, pad);
# MaxPool2d(3, 2) sits at indices 2 and 5 (after relu1 and relu2)
_ALEX_FEATURES = [(0, 64, 11, 4, 2), (3, 192, 5, 1, 2), (6, 384, 3, 1, 1),
                  (8, 256, 3, 1, 1), (10, 256, 3, 1, 1)]


def _random_alexnet_state_dict(seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    cin = 3
    for ti, cout, k, _, _ in _ALEX_FEATURES:
        sd[f"features.{ti}.weight"] = torch.from_numpy(
            rng.randn(cout, cin, k, k).astype(np.float32) * 0.05)
        sd[f"features.{ti}.bias"] = torch.from_numpy(
            rng.randn(cout).astype(np.float32) * 0.05)
        cin = cout
    return sd


def _torch_lpips(sd_alex, sd_lin, x0_nchw, x1_nchw):
    shift = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    scale = torch.tensor([.458, .448, .450])[None, :, None, None]

    def alex_taps(x):
        taps = []
        y = x
        for i, (ti, _, _, stride, pad) in enumerate(_ALEX_FEATURES):
            if i in (1, 2):
                y = F.max_pool2d(y, 3, 2)
            y = F.relu(F.conv2d(y, sd_alex[f"features.{ti}.weight"],
                                sd_alex[f"features.{ti}.bias"],
                                stride=stride, padding=pad))
            taps.append(y)
        return taps

    def normalize(t):  # ps_util.normalize_tensor, eps 1e-10
        return t / (torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True)) + 1e-10)

    f0 = alex_taps((x0_nchw - shift) / scale)
    f1 = alex_taps((x1_nchw - shift) / scale)
    val = 0.0
    for i in range(5):
        d = (normalize(f0[i]) - normalize(f1[i])) ** 2
        lin = sd_lin[f"lin{i}.model.1.weight"]  # (1, C, 1, 1), no bias
        val = val + F.conv2d(d, lin).mean(dim=(2, 3))  # spatial_average
    return val.reshape(-1)


def test_lpips_port_matches_torch(tmp_path):
    sd_alex = _random_alexnet_state_dict()
    alex_path = os.path.join(str(tmp_path), "alexnet.pth")
    torch.save(sd_alex, alex_path)
    assert os.path.exists(REFERENCE_LIN_WEIGHTS)
    sd_lin = torch.load(REFERENCE_LIN_WEIGHTS, map_location="cpu",
                        weights_only=True)

    params, exact = load_lpips_params(alexnet_path=alex_path)
    assert exact, "both weight files provided -> exact must be True"

    rng = np.random.RandomState(2)
    x0 = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    x1 = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    got = np.asarray(lpips(params, jnp.asarray(x0), jnp.asarray(x1)))
    with torch.no_grad():
        want = _torch_lpips(sd_alex, sd_lin, _nchw(x0), _nchw(x1)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# FID InceptionV3 (reference: pytorch_fid/inception.py — torchvision
# inception_v3(num_classes=1008, aux_logits=False) with the FID-patched
# A/C/E blocks; pool3 = AdaptiveAvgPool2d(1); input resized to 299 bilinear
# align_corners=False on [0,1] then scaled to [-1,1])
# ---------------------------------------------------------------------------

def _bconv(sd, name, x, stride=1, pad=(0, 0)):
    """BasicConv2d: conv(bias=False) + BatchNorm2d(eps=0.001) + relu."""
    y = F.conv2d(x, sd[f"{name}.conv.weight"], None, stride=stride,
                 padding=pad)
    y = F.batch_norm(y, sd[f"{name}.bn.running_mean"],
                     sd[f"{name}.bn.running_var"], sd[f"{name}.bn.weight"],
                     sd[f"{name}.bn.bias"], training=False, eps=0.001)
    return F.relu(y)


def _avg_tf(x):  # FID patch: count_include_pad=False (inception.py:205 etc.)
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


def _torch_fid_pool3(sd, x01_nchw):
    x = F.interpolate(x01_nchw, size=(299, 299), mode="bilinear",
                      align_corners=False)
    x = 2 * x - 1

    x = _bconv(sd, "Conv2d_1a_3x3", x, stride=2)
    x = _bconv(sd, "Conv2d_2a_3x3", x)
    x = _bconv(sd, "Conv2d_2b_3x3", x, pad=(1, 1))
    x = F.max_pool2d(x, 3, 2)
    x = _bconv(sd, "Conv2d_3b_1x1", x)
    x = _bconv(sd, "Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)

    def block_a(n, x):  # FIDInceptionA (inception.py:193-215)
        b1 = _bconv(sd, f"{n}.branch1x1", x)
        b5 = _bconv(sd, f"{n}.branch5x5_2",
                    _bconv(sd, f"{n}.branch5x5_1", x), pad=(2, 2))
        b3 = _bconv(sd, f"{n}.branch3x3dbl_1", x)
        b3 = _bconv(sd, f"{n}.branch3x3dbl_2", b3, pad=(1, 1))
        b3 = _bconv(sd, f"{n}.branch3x3dbl_3", b3, pad=(1, 1))
        bp = _bconv(sd, f"{n}.branch_pool", _avg_tf(x))
        return torch.cat([b1, b5, b3, bp], 1)

    def block_b(x):  # torchvision InceptionB (Mixed_6a)
        b3 = _bconv(sd, "Mixed_6a.branch3x3", x, stride=2)
        bd = _bconv(sd, "Mixed_6a.branch3x3dbl_1", x)
        bd = _bconv(sd, "Mixed_6a.branch3x3dbl_2", bd, pad=(1, 1))
        bd = _bconv(sd, "Mixed_6a.branch3x3dbl_3", bd, stride=2)
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

    def block_c(n, x):  # FIDInceptionC (inception.py:218-245)
        b1 = _bconv(sd, f"{n}.branch1x1", x)
        b7 = _bconv(sd, f"{n}.branch7x7_1", x)
        b7 = _bconv(sd, f"{n}.branch7x7_2", b7, pad=(0, 3))
        b7 = _bconv(sd, f"{n}.branch7x7_3", b7, pad=(3, 0))
        bd = _bconv(sd, f"{n}.branch7x7dbl_1", x)
        for i, p in ((2, (3, 0)), (3, (0, 3)), (4, (3, 0)), (5, (0, 3))):
            bd = _bconv(sd, f"{n}.branch7x7dbl_{i}", bd, pad=p)
        bp = _bconv(sd, f"{n}.branch_pool", _avg_tf(x))
        return torch.cat([b1, b7, bd, bp], 1)

    def block_d(x):  # torchvision InceptionD (Mixed_7a)
        b3 = _bconv(sd, "Mixed_7a.branch3x3_2",
                    _bconv(sd, "Mixed_7a.branch3x3_1", x), stride=2)
        b7 = _bconv(sd, "Mixed_7a.branch7x7x3_1", x)
        b7 = _bconv(sd, "Mixed_7a.branch7x7x3_2", b7, pad=(0, 3))
        b7 = _bconv(sd, "Mixed_7a.branch7x7x3_3", b7, pad=(3, 0))
        b7 = _bconv(sd, "Mixed_7a.branch7x7x3_4", b7, stride=2)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    def block_e(n, x, pool_max):  # FIDInceptionE_1/_2 (inception.py:248-310)
        b1 = _bconv(sd, f"{n}.branch1x1", x)
        b3 = _bconv(sd, f"{n}.branch3x3_1", x)
        b3 = torch.cat([_bconv(sd, f"{n}.branch3x3_2a", b3, pad=(0, 1)),
                        _bconv(sd, f"{n}.branch3x3_2b", b3, pad=(1, 0))], 1)
        bd = _bconv(sd, f"{n}.branch3x3dbl_1", x)
        bd = _bconv(sd, f"{n}.branch3x3dbl_2", bd, pad=(1, 1))
        bd = torch.cat([_bconv(sd, f"{n}.branch3x3dbl_3a", bd, pad=(0, 1)),
                        _bconv(sd, f"{n}.branch3x3dbl_3b", bd, pad=(1, 0))], 1)
        pool = (F.max_pool2d(x, 3, stride=1, padding=1) if pool_max
                else _avg_tf(x))
        bp = _bconv(sd, f"{n}.branch_pool", pool)
        return torch.cat([b1, b3, bd, bp], 1)

    x = block_a("Mixed_5b", x)
    x = block_a("Mixed_5c", x)
    x = block_a("Mixed_5d", x)
    x = block_b(x)
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = block_c(n, x)
    x = block_d(x)
    x = block_e("Mixed_7b", x, pool_max=False)
    x = block_e("Mixed_7c", x, pool_max=True)   # FIDInceptionE_2: max pool
    return x.mean(dim=(2, 3))  # AdaptiveAvgPool2d((1,1))


def _random_inception_state_dict(seed=0):
    """Random pt_inception-format state dict for every BasicConv2d."""
    from deepsee_tpu.eval.fid import _conv_specs
    rng = np.random.RandomState(seed)
    sd = {}
    for name, cin, cout, k, _, _ in _conv_specs():
        # He-scaled kernels + near-identity BN stats keep activations O(1)
        # across ~90 convs so tight tolerances are meaningful
        std = np.sqrt(2.0 / (cin * k[0] * k[1]))
        sd[f"{name}.conv.weight"] = torch.from_numpy(
            (rng.randn(cout, cin, k[0], k[1]) * std).astype(np.float32))
        sd[f"{name}.bn.weight"] = torch.from_numpy(
            (rng.rand(cout).astype(np.float32) * 0.2 + 0.9))
        sd[f"{name}.bn.bias"] = torch.from_numpy(
            rng.randn(cout).astype(np.float32) * 0.1)
        sd[f"{name}.bn.running_mean"] = torch.from_numpy(
            rng.randn(cout).astype(np.float32) * 0.1)
        sd[f"{name}.bn.running_var"] = torch.from_numpy(
            (rng.rand(cout).astype(np.float32) * 0.2 + 0.9))
    return sd


def test_fid_inception_port_matches_torch(tmp_path):
    sd = _random_inception_state_dict()
    path = os.path.join(str(tmp_path), "pt_inception.pth")
    torch.save(sd, path)

    params, exact = load_inception_params(path)
    assert exact

    rng = np.random.RandomState(3)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    got = np.asarray(inception_pool3(params, jnp.asarray(x)))
    with torch.no_grad():
        # inception_util.get_batch_activations: [-1,1] -> [0,1] first
        want = _torch_fid_pool3(sd, (_nchw(x) + 1.0) / 2.0).numpy()
    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
