"""The 32x parallel plan on the CPU mesh: PureSEAN tail + capped-fm quirk +
spatial (H) sharding must match single-device execution."""

import numpy as np
import jax
import jax.numpy as jnp

from deepsee_tpu.config import (DataConfig, Experiment, MeshConfig,
                                ModelConfig, TrainConfig)
from deepsee_tpu.parallel import make_mesh, shard_batch, shard_system_variables
from deepsee_tpu.system import SRSystem


def test_puresean_quirk_spatial_sharding_matches_single():
    # load_size >= 512 engages the PureSEAN tail (sr.py:43-51); max_fm 32
    # triggers the capped-fm quirk at the 64/128-px blocks; crop 128 keeps
    # CPU cost low.  regional_style_size must be 128 for the quirk path.
    cfg = ModelConfig(start_size=8, crop_size=128, load_size=512,
                      ngf=2, nef=2, regional_style_size=128,
                      max_fm_size=32, add_noise=False,
                      compute_dtype="float32")
    exp = Experiment(name="t512sp", model=cfg, train=TrainConfig(batch_size=2),
                     data=DataConfig(), is_train=False)
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    b = 2
    batch = {
        "image_hr": np.tanh(rng.randn(b, 128, 128, 3)).astype(np.float32),
        "label": rng.randint(0, cfg.label_nc, (b, 128, 128)).astype(np.int32),
    }

    @jax.jit
    def infer(g, e, bt):
        pre = system.preprocess(bt)
        fake, _, _ = system.generate(g, e, pre, use_full=False,
                                     no_noise=True, train=False)
        return fake

    want = np.asarray(jax.device_get(
        infer(variables.g, variables.e,
              {k: jnp.asarray(v) for k, v in batch.items()})))

    mesh = make_mesh(MeshConfig(2, 4, "spatial"))
    svars = variables.replace(
        g=shard_system_variables(variables.g, mesh, shard_model=False),
        e=shard_system_variables(variables.e, mesh, shard_model=False))
    got = np.asarray(jax.device_get(
        infer(svars.g, svars.e, shard_batch(batch, mesh, spatial=True))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
