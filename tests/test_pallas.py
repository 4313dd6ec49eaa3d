"""Pallas fused modulated-instance-norm kernel: interpret-mode correctness."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepsee_tpu.ops.pallas.modnorm import modulated_instance_norm
from deepsee_tpu.ops.norms import instance_norm_2d


@pytest.mark.parametrize("shape", [(2, 32, 32, 128), (1, 64, 64, 256)])
def test_modnorm_matches_xla(shape):
    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32) * 3 + 1
    scale = rng.randn(*shape).astype(np.float32)
    offset = rng.randn(*shape).astype(np.float32)

    want = np.asarray(instance_norm_2d(jnp.asarray(x)) * scale + offset)
    got = np.asarray(modulated_instance_norm(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(offset),
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_modnorm_bf16():
    rng = np.random.RandomState(1)
    shape = (1, 32, 32, 128)
    x = (rng.randn(*shape) * 2).astype(np.float32)
    scale = rng.randn(*shape).astype(np.float32)
    offset = rng.randn(*shape).astype(np.float32)
    want = np.asarray(instance_norm_2d(jnp.asarray(x)) * scale + offset)
    got = np.asarray(modulated_instance_norm(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(scale, jnp.bfloat16),
        jnp.asarray(offset, jnp.bfloat16), interpret=True)).astype(np.float32)
    assert np.abs(got - want).max() < 0.15  # bf16 tolerance
