"""Smoke + multi-device tests for the fused GAN training step."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from deepsee_tpu.config import tiny_test_experiment, MeshConfig
from deepsee_tpu.parallel import make_mesh, shard_batch, shard_train_state
from deepsee_tpu.system import SRSystem
from deepsee_tpu.train import create_train_state, make_train_step


def _batch(cfg, b, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image_hr": np.tanh(rng.randn(b, cfg.crop_size, cfg.crop_size, 3))
        .astype(np.float32),
        "label": rng.randint(0, cfg.label_nc,
                             (b, cfg.crop_size, cfg.crop_size)).astype(np.int32),
    }


def test_train_step_runs_and_learns():
    exp = tiny_test_experiment()
    system = SRSystem(exp)
    state = create_train_state(system, jax.random.PRNGKey(0))
    step = make_train_step(system, donate=False)

    batch = _batch(exp.model, exp.train.batch_size)
    p0 = jax.device_get(state.g_vars["params"]["initial"]["kernel"])
    d0 = jax.device_get(
        state.d_vars["params"]["discriminator_0"]["model0"]["kernel"])

    logs = None
    for i in range(2):
        state, logs = step(state, batch)
    logs = jax.device_get(logs)

    for name in ("GAN", "GAN_Feat", "VGG", "D_Fake", "D_real"):
        assert name in logs, f"missing loss {name}"
        assert np.isfinite(logs[name]), f"{name} not finite: {logs[name]}"

    p1 = jax.device_get(state.g_vars["params"]["initial"]["kernel"])
    d1 = jax.device_get(
        state.d_vars["params"]["discriminator_0"]["model0"]["kernel"])
    assert np.abs(p1 - p0).max() > 0, "generator params did not update"
    assert np.abs(d1 - d0).max() > 0, "discriminator params did not update"
    assert int(state.step) == 2


def test_train_step_multichip_matches_single():
    """Replicate-and-compare (the JAX analogue of the reference's SyncBN
    test, Synchronized-BatchNorm-PyTorch/tests/test_sync_batchnorm.py):
    one fused step on a 1-device mesh vs a 2x4 dp/tp mesh must agree."""
    exp = tiny_test_experiment()
    # widen the trunk so tensor sharding over 4 devices actually happens
    exp = exp.replace(model=exp.model.__class__(
        **{**exp.model.__dict__, "ngf": 8}), mesh=MeshConfig(2, 4))
    system = SRSystem(exp)
    batch = _batch(exp.model, exp.train.batch_size)

    def run(mesh_cfg, shard):
        mesh = make_mesh(mesh_cfg)
        state = create_train_state(system, jax.random.PRNGKey(0))
        if shard:
            # min_shard_ch lowered so the tiny aux nets (D/encoder/VGG)
            # actually exercise their column/row tensor-parallel specs
            state = shard_train_state(state, mesh, min_shard_ch=8)
            from jax.sharding import PartitionSpec as P
            d_kernel = state.d_vars["params"]["discriminator_0"]["model3"][
                "conv"]["kernel"]
            assert d_kernel.sharding.spec == P(None, None, None, "model"), (
                "D model3 should be column-sharded")
            vgg_kernel = state.vgg["params"]["conv9_kernel"]
            assert vgg_kernel.sharding.spec == P(None, None, None, "model"), (
                "VGG conv9 should be column-sharded")
            # Adam moments follow the param shardings (not replicated)
            mu = state.opt_g.inner_state[0].mu
            g_k = mu["g"]["initial"]["kernel"]
            assert g_k.sharding == state.g_vars["params"]["initial"][
                "kernel"].sharding, "opt moments must shard like params"
        b = shard_batch(batch, mesh)
        step = make_train_step(system, donate=False)
        state, logs = step(state, b)
        return jax.device_get(logs), jax.device_get(
            state.g_vars["params"]["initial"]["kernel"])

    logs1, k1 = run(MeshConfig(1, 1), shard=False)
    logs8, k8 = run(MeshConfig(2, 4), shard=True)

    for name in logs1:
        np.testing.assert_allclose(logs8[name], logs1[name], rtol=5e-4,
                                   atol=1e-5, err_msg=name)
    np.testing.assert_allclose(k8, k1, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_train_step_multislice_matches_single():
    """Multi-slice layout (leading "dcn" axis = data parallelism across
    slices): dcn2 x dp2 x tp2 must reproduce the single-device step — the
    dcn axis only re-routes where the batch halves and the gradient
    all-reduce travel, never the math."""
    exp = tiny_test_experiment()
    exp = exp.replace(model=exp.model.__class__(
        **{**exp.model.__dict__, "ngf": 8}),
        mesh=MeshConfig(2, 2, dcn_axis=2), train=exp.train.__class__(
            **{**exp.train.__dict__, "batch_size": 4}))
    system = SRSystem(exp)
    batch = _batch(exp.model, exp.train.batch_size)

    def run(mesh_cfg, shard):
        mesh = make_mesh(mesh_cfg)
        state = create_train_state(system, jax.random.PRNGKey(0))
        if shard:
            state = shard_train_state(state, mesh, min_shard_ch=8)
            # params must REPLICATE over dcn (only batch + grads cross it)
            k = state.g_vars["params"]["initial"]["kernel"]
            assert "dcn" not in jax.tree_util.tree_leaves(
                [ax for ax in k.sharding.spec if ax]), (
                "params must not shard over the dcn axis")
        b = shard_batch(batch, mesh)
        # the batch dim is split over BOTH dcn and data
        n_batch_shards = mesh_cfg.dcn_axis * mesh_cfg.data_axis
        assert (b["image_hr"].sharding.shard_shape(b["image_hr"].shape)[0]
                == exp.train.batch_size // n_batch_shards)
        step = make_train_step(system, donate=False)
        state, logs = step(state, b)
        return jax.device_get(logs), jax.device_get(
            state.g_vars["params"]["initial"]["kernel"])

    logs1, k1 = run(MeshConfig(1, 1), shard=False)
    logs8, k8 = run(MeshConfig(2, 2, dcn_axis=2), shard=True)

    for name in logs1:
        np.testing.assert_allclose(logs8[name], logs1[name], rtol=5e-4,
                                   atol=1e-5, err_msg=name)
    np.testing.assert_allclose(k8, k1, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_training_dynamics_overfit_one_batch():
    """Gradient/TTUR wiring sanity: overfitting one batch must drive the
    perceptual loss down while the hinge D losses stay near equilibrium."""
    exp = tiny_test_experiment()
    system = SRSystem(exp)
    state = create_train_state(system, jax.random.PRNGKey(0))
    step = make_train_step(system, donate=False)
    batch = _batch(exp.model, exp.train.batch_size)

    first = last = None
    for i in range(40):
        state, logs = step(state, batch)
        if i == 0:
            first = jax.device_get(logs)
    last = jax.device_get(logs)
    assert last["VGG"] < 0.7 * first["VGG"], (first["VGG"], last["VGG"])
    assert 0.05 < last["D_Fake"] < 2.5
    assert 0.05 < last["D_real"] < 2.5


@pytest.mark.slow
def test_reuse_fake_single_forward_schedule():
    """Opt-in `reuse_fake` (TrainConfig): D trains on the G-step fake
    instead of regenerating with the just-updated G (deviation from
    sr_model.py:550-553, documented in config.py).  Must (a) run and
    learn, and (b) actually remove one generator forward from the
    compiled step — checked via XLA cost analysis FLOPs."""
    import dataclasses

    exp = tiny_test_experiment()
    batch = _batch(exp.model, exp.train.batch_size)

    def compiled_flops(reuse):
        e = exp.replace(train=dataclasses.replace(exp.train,
                                                  reuse_fake=reuse))
        system = SRSystem(e)
        state = create_train_state(system, jax.random.PRNGKey(0))
        step = make_train_step(system, donate=False)
        lowered = step.lower(state, batch)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"]), system, state, step

    flops_faithful, _, _, _ = compiled_flops(False)
    flops_reuse, system, state, step = compiled_flops(True)
    # one full G+E forward (incl. its preprocessing share) disappears
    assert flops_reuse < 0.92 * flops_faithful, (flops_reuse, flops_faithful)

    state, logs = step(state, batch)
    state, logs = step(state, batch)
    logs = jax.device_get(logs)
    for name in ("GAN", "GAN_Feat", "VGG", "D_Fake", "D_real"):
        assert np.isfinite(logs[name]), f"{name} not finite under reuse_fake"

    # D-only steps (do_g=False, D_steps_per_G > 1) have no G-step fake to
    # reuse and must still regenerate — same FLOPs with or without the flag
    def d_only_flops(reuse):
        e = exp.replace(train=dataclasses.replace(exp.train,
                                                  reuse_fake=reuse))
        sys_ = SRSystem(e)
        st = create_train_state(sys_, jax.random.PRNGKey(0))
        d_step = make_train_step(sys_, do_g=False, donate=False)
        cost = d_step.lower(st, batch).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"])

    np.testing.assert_allclose(d_only_flops(True), d_only_flops(False),
                               rtol=1e-6)


@pytest.mark.slow
def test_graft_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # trace-only check on CPU (256^2 model too slow to execute in tests)
    shape = jax.eval_shape(fn, *args)
    assert shape.shape == (1, 256, 256, 3)

    ge.dryrun_multichip(8)
