"""Checkpoint portability across mesh configurations.

A production resize path the reference never had (its `.pth` files are
device-free, util/util.py:217-237, but its DataParallel/model_parallel
runtime could not change world size mid-run): an Orbax checkpoint written
from a single-device run must restore directly onto a dp x tp mesh with
the restored arrays carrying the mesh shardings (no host round trip), and
vice versa — and training must continue losslessly from either direction.
"""

import dataclasses

import pytest

import numpy as np
import jax

from deepsee_tpu.config import tiny_test_experiment, MeshConfig
from deepsee_tpu.parallel import make_mesh, shard_batch, shard_train_state
from deepsee_tpu.system import SRSystem
from deepsee_tpu.train import create_train_state, make_train_step
from deepsee_tpu.utils.checkpoint import CheckpointManager


def _exp(tmp_path):
    exp = tiny_test_experiment().replace(checkpoints_dir=str(tmp_path))
    # widen the trunk so tensor sharding over 4 devices actually happens
    return exp.replace(model=dataclasses.replace(exp.model, ngf=8),
                       mesh=MeshConfig(2, 4))


def _batch(cfg, b, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image_hr": np.tanh(rng.randn(b, cfg.crop_size, cfg.crop_size, 3))
        .astype(np.float32),
        "label": rng.randint(0, cfg.label_nc,
                             (b, cfg.crop_size, cfg.crop_size))
        .astype(np.int32),
    }


def test_single_device_checkpoint_restores_sharded(tmp_path):
    exp = _exp(tmp_path)
    system = SRSystem(exp)
    step = make_train_step(system, donate=False)
    batch = _batch(exp.model, exp.train.batch_size)

    # train 2 steps on one device, checkpoint
    state = create_train_state(system, jax.random.PRNGKey(0))
    for _ in range(2):
        state, _ = step(state, batch)
    ckpt = CheckpointManager(exp)
    ckpt.save(2, state)
    k_saved = np.asarray(jax.device_get(
        state.g_vars["params"]["initial"]["kernel"]))
    ckpt.close()

    # restore against a SHARDED template: arrays must land on the mesh
    mesh = make_mesh(exp.mesh)
    template = shard_train_state(
        create_train_state(system, jax.random.PRNGKey(1)), mesh,
        min_shard_ch=8)
    ckpt2 = CheckpointManager(exp)
    restored = ckpt2.restore(template)
    ckpt2.close()

    g_k = restored.g_vars["params"]["initial"]["kernel"]
    assert g_k.sharding == template.g_vars["params"]["initial"][
        "kernel"].sharding, "restored array must carry the mesh sharding"
    np.testing.assert_array_equal(np.asarray(jax.device_get(g_k)), k_saved)
    # optimizer moments restored AND sharded like their params
    mu = restored.opt_g.inner_state[0].mu
    assert mu["g"]["initial"]["kernel"].sharding == g_k.sharding
    assert int(restored.step) == 2

    # continue training sharded: must match continuing on one device
    b = shard_batch(batch, mesh)
    sharded_next, logs_sharded = step(restored, b)
    single_next, logs_single = step(state, batch)
    logs_sharded = jax.device_get(logs_sharded)
    logs_single = jax.device_get(logs_single)
    for name in logs_single:
        np.testing.assert_allclose(logs_sharded[name], logs_single[name],
                                   rtol=5e-4, atol=1e-5, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(
            sharded_next.g_vars["params"]["initial"]["kernel"])),
        np.asarray(jax.device_get(
            single_next.g_vars["params"]["initial"]["kernel"])),
        rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_sharded_checkpoint_restores_single_device(tmp_path):
    exp = _exp(tmp_path)
    system = SRSystem(exp)
    step = make_train_step(system, donate=False)
    batch = _batch(exp.model, exp.train.batch_size)

    mesh = make_mesh(exp.mesh)
    state = shard_train_state(
        create_train_state(system, jax.random.PRNGKey(0)), mesh,
        min_shard_ch=8)
    state, _ = step(state, shard_batch(batch, mesh))
    ckpt = CheckpointManager(exp)
    ckpt.save(1, state)
    k_saved = np.asarray(jax.device_get(
        state.g_vars["params"]["initial"]["kernel"]))
    ckpt.close()

    template = create_train_state(system, jax.random.PRNGKey(1))
    ckpt2 = CheckpointManager(exp)
    restored = ckpt2.restore(template)
    ckpt2.close()

    g_k = restored.g_vars["params"]["initial"]["kernel"]
    assert len(g_k.sharding.device_set) == 1, (
        "restore against a single-device template must gather the shards")
    np.testing.assert_array_equal(np.asarray(jax.device_get(g_k)), k_saved)

    # and the single-device step runs from it
    restored, logs = step(restored, batch)
    logs = jax.device_get(logs)
    assert all(np.isfinite(v) for v in logs.values())
