"""Parity tests for norm/pool primitives vs torch."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from deepsee_tpu.ops import avg_pool_3x3_s2, instance_norm_2d
from deepsee_tpu.ops.norms import leaky_relu


def _rand_nhwc(b, h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(b, h, w, c).astype(np.float32)


def test_instance_norm_parity():
    x = _rand_nhwc(3, 9, 11, 7)
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = torch.nn.InstanceNorm2d(7)(t).numpy()
    got = np.transpose(np.asarray(instance_norm_2d(jnp.asarray(x))), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_avg_pool_parity():
    # discriminator.py:46-49 downsample
    for hw in [(64, 64), (65, 67)]:
        x = _rand_nhwc(2, *hw, 5, seed=hw[0])
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want = F.avg_pool2d(t, kernel_size=3, stride=2, padding=[1, 1],
                            count_include_pad=False).numpy()
        got = np.transpose(np.asarray(avg_pool_3x3_s2(jnp.asarray(x))),
                           (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_leaky_relu_parity():
    x = _rand_nhwc(1, 4, 4, 4)
    want = F.leaky_relu(torch.from_numpy(x), 2e-1).numpy()
    got = np.asarray(leaky_relu(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=0)
