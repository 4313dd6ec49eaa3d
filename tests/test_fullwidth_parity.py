"""Generator parity at the real 128px preset width (ngf=32, 512-ch trunk).

The other parity tests shrink channels for speed; this one runs the actual
8x_128 architecture once in eval mode to catch any width-dependent issue
(tiling, folded-conv concat order, channel bookkeeping)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import torch

from ref_utils import make_ref_opt, to_nchw, to_nhwc

from deepsee_tpu.config import get_preset
from deepsee_tpu.models.generator import DeepSEEGenerator
from deepsee_tpu.utils.torch_import import import_torch_state


@pytest.mark.slow
def test_generator_parity_full_width_128():
    from deepsee_models.networks.sr import DeepSEESR

    exp = get_preset("8x_independent_128x128")
    cfg = exp.model.__class__(**{**exp.model.__dict__,
                                 "compute_dtype": "float32",
                                 "add_noise": False})
    opt = make_ref_opt(cfg)
    torch.manual_seed(0)
    ref = DeepSEESR(opt)

    rng = np.random.RandomState(0)
    lr = np.tanh(rng.randn(1, 16, 16, 3)).astype(np.float32)
    seg = np.eye(cfg.semantic_nc, dtype=np.float32)[
        rng.randint(0, cfg.semantic_nc, (1, 128, 128))]
    style = np.tanh(rng.randn(1, cfg.label_nc,
                              cfg.regional_style_size)).astype(np.float32)

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
    # tanh output in [-1, 1]: absolute tolerance meaningful here
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)