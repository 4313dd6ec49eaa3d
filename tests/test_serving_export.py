"""AOT serving-export roundtrip tests (deepsee_tpu/serve.py).

The exported StableHLO program must reproduce the live SRSystem forward
exactly (same weights baked in as constants), for both the independent and
guided model families, and reload through `load_serving` from disk.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.serve import (export_serving, load_serving, make_serving_fns,
                               save_serving, serving_arg_specs)
from deepsee_tpu.system import SRSystem


def _inputs(cfg, b=2, seed=0):
    rng = np.random.RandomState(seed)
    lr = jnp.asarray(
        np.tanh(rng.randn(b, cfg.start_size, cfg.start_size, 3)), jnp.float32)
    lab = jnp.asarray(
        rng.randint(0, cfg.label_nc, (b, cfg.crop_size, cfg.crop_size)),
        jnp.int32)
    hr = jnp.asarray(
        np.tanh(rng.randn(b, cfg.crop_size, cfg.crop_size, 3)), jnp.float32)
    return lr, lab, hr


@pytest.mark.parametrize("guided", [False, True])
def test_serving_roundtrip(tmp_path, guided):
    exp = tiny_test_experiment(is_train=False)
    if guided:
        exp = exp.replace(model=dataclasses.replace(
            exp.model, net_e="fullstyle", guiding_style_image=True))
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    cfg = exp.model

    lr, lab, hr = _inputs(cfg)
    end_to_end, styled = make_serving_fns(system, variables)
    e2e_args = (lr, lab, hr, lab) if guided else (lr, lab)
    ref_fake, ref_style = jax.jit(end_to_end)(*e2e_args)

    blobs = export_serving(exp, variables, batch_size=2, platforms=("cpu",))
    save_serving(str(tmp_path), exp, blobs, batch_size=2, platforms=("cpu",))

    fn = load_serving(str(tmp_path))  # default end_to_end
    fake, style = fn(*e2e_args)
    np.testing.assert_allclose(np.asarray(fake), np.asarray(ref_fake),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(style), np.asarray(ref_style),
                               rtol=1e-5, atol=1e-5)

    # styled program: splice a perturbed style through the second entry point
    sty = ref_style + 0.1
    ref_img = jax.jit(styled)(lr, lab, sty)
    fn2 = load_serving(str(tmp_path), "styled")
    img = fn2(lr, lab, sty)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               rtol=1e-5, atol=1e-5)

    # manifest records the calling convention
    import json
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert manifest["guiding_style_image"] == guided
    assert "styled" in manifest["programs"]


def test_serving_cross_platform_export():
    """Export-on-host, serve-on-TPU: lowering for the tpu target must work
    from a CPU process (the scripts/export_serving.py default)."""
    exp = tiny_test_experiment(is_train=False)
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    blobs = export_serving(exp, variables, batch_size=1,
                           platforms=("tpu", "cpu"))
    assert set(blobs) == {"end_to_end", "styled"}
    assert all(len(b) > 10_000 for b in blobs.values())


def test_serving_arg_specs_shapes():
    exp = tiny_test_experiment(is_train=False)
    e2e_args, styled_args = serving_arg_specs(exp, batch_size=3)
    assert e2e_args[0].shape == (3, 8, 8, 3)
    assert e2e_args[1].shape == (3, 32, 32)
    assert styled_args[2].shape == (3, exp.model.label_nc, 16)
