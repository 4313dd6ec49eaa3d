"""Spatial (H-dim) sharding equivalence — the conv-net context-parallel
analogue: inference on a dp x sp mesh must match single-device output."""

import numpy as np
import jax
import jax.numpy as jnp

from deepsee_tpu.config import MeshConfig, tiny_test_experiment
from deepsee_tpu.parallel import make_mesh, shard_batch, shard_system_variables
from deepsee_tpu.system import SRSystem


def test_spatial_sharded_inference_matches_single():
    exp = tiny_test_experiment().replace(is_train=False)
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    cfg = exp.model

    rng = np.random.RandomState(0)
    b = 4
    batch = {
        "image_hr": np.tanh(rng.randn(b, cfg.crop_size, cfg.crop_size, 3))
        .astype(np.float32),
        "label": rng.randint(0, cfg.label_nc,
                             (b, cfg.crop_size, cfg.crop_size))
        .astype(np.int32),
    }

    @jax.jit
    def infer(g, e, batch):
        pre = system.preprocess(batch)
        fake, _, _ = system.generate(g, e, pre, use_full=False,
                                     no_noise=True, train=False)
        return fake

    want = np.asarray(jax.device_get(
        infer(variables.g, variables.e,
              {k: jnp.asarray(v) for k, v in batch.items()})))

    mesh = make_mesh(MeshConfig(2, 4))
    sharded_vars = variables.replace(
        g=shard_system_variables(variables.g, mesh, shard_model=False),
        e=shard_system_variables(variables.e, mesh, shard_model=False))
    sbatch = shard_batch(batch, mesh, spatial=True)
    # H is sharded over the 4-way "model" axis
    assert "model" in str(sbatch["image_hr"].sharding.spec)

    got = np.asarray(jax.device_get(
        infer(sharded_vars.g, sharded_vars.e, sbatch)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
