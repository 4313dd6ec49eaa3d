"""Parity of the 32x/512px generator path: PureSEAN tail + the reference's
fm-resize quirk (normalization.py:188-190) with capped feature maps."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from ref_utils import make_ref_opt, to_nchw, to_nhwc

from deepsee_tpu.config import ModelConfig
from deepsee_tpu.models.generator import DeepSEEGenerator
from deepsee_tpu.utils.torch_import import import_torch_state


def test_32x_generator_parity_with_quirk():
    from deepsee_models.networks.sr import DeepSEESR

    # 16 -> 512 (n_blocks=5, PureSEAN tail kicks in past block 4), with
    # max_fm_size=64 so SEAN/PureSEAN blocks at 128/256/512 hit the capped
    # path and the reference's style_map:=interpolate(actv) quirk fires.
    # The quirk requires regional_style_size == nhidden == 128.
    cfg = ModelConfig(start_size=16, crop_size=512, load_size=512,
                      ngf=1, nef=1, regional_style_size=128,
                      max_fm_size=64, add_noise=False,
                      compute_dtype="float32")
    opt = make_ref_opt(cfg)
    torch.manual_seed(0)
    ref = DeepSEESR(opt)

    rng = np.random.RandomState(0)
    lr = np.tanh(rng.randn(1, 16, 16, 3)).astype(np.float32)
    seg = np.eye(cfg.semantic_nc, dtype=np.float32)[
        rng.randint(0, cfg.semantic_nc, (1, 512, 512))]
    style = np.tanh(rng.randn(1, cfg.label_nc, 128)).astype(np.float32)

    mod = DeepSEEGenerator(cfg)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(lr),
                         jnp.asarray(seg), jnp.asarray(style), train=False)
    variables = import_torch_state(variables, ref.state_dict(), strict=True)

    ref.eval()
    with torch.no_grad():
        want = to_nhwc(ref(to_nchw(lr), to_nchw(seg),
                           torch.from_numpy(style)))
    got = np.asarray(mod.apply(variables, jnp.asarray(lr), jnp.asarray(seg),
                               jnp.asarray(style), train=False))
    assert got.shape == (1, 512, 512, 3)
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-5 * scale)
