"""Subprocess worker for the real two-process multi-host test.

Each worker is one "host": jax.distributed.initialize + 4 forced CPU
devices; the pair forms an 8-device global mesh with cross-process Gloo
collectives — the honest analogue of a 2-host TPU pod.  Covers the FULL
training lifecycle, not just the step:

  1. fused GAN train step over the dp mesh (cross-process collectives)
  2. host_local_variables on replicated params (the dp in-training eval
     pull) — and on TENSOR-SHARDED params, which exercises the real
     all-gather path (one replicating jit) added for in-loop eval under
     dp×tp (reference equivalent: train.py:85-105 evaluating under
     model_parallel_mode)
  3. a REAL Orbax save + restore with every process participating in the
     multi-host commit protocol (util/util.py:217-237 analogue)
  4. a REAL InferenceEvaluator.run with the genuine cross-host gather
     (each host sweeps its loader stripe; process_allgather merges)

Run by tests/test_distributed_multihost.py, not directly.
"""

import json
import os
import sys


def main():
    pid, nproc, coord, tmpdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
        " --xla_disable_hlo_passes=space-to-batch-converter").strip()

    import time as _time0
    global _T0
    _T0 = _time0.time()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from deepsee_tpu.config import MeshConfig, tiny_test_experiment
    from deepsee_tpu.parallel import (host_local_variables, make_mesh,
                                      shard_batch, shard_train_state)
    from deepsee_tpu.system import SRSystem, SystemVariables
    from deepsee_tpu.train import create_train_state, make_train_step

    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    exp = tiny_test_experiment()
    exp = exp.replace(
        mesh=MeshConfig(8, 1), checkpoints_dir=tmpdir,
        train=exp.train.__class__(
            **{**exp.train.__dict__, "batch_size": 8}))
    system = SRSystem(exp)
    mesh = make_mesh(exp.mesh)

    state = create_train_state(system, jax.random.PRNGKey(0))
    state = shard_train_state(state, mesh, shard_model=False)

    # the host-sharded DataLoader contract: global batch 8, each host
    # yields ITS 4-row stripe of the deterministic global batch
    rng = np.random.RandomState(0)
    cfg = exp.model
    g_img = np.tanh(rng.randn(8, cfg.crop_size, cfg.crop_size, 3)).astype(
        np.float32)
    g_lab = rng.randint(0, cfg.label_nc,
                        (8, cfg.crop_size, cfg.crop_size)).astype(np.int32)
    lo, hi = pid * 4, (pid + 1) * 4
    local = {"image_hr": g_img[lo:hi], "label": g_lab[lo:hi]}

    batch = shard_batch(local, mesh)
    assert batch["image_hr"].shape[0] == 8, "global batch not assembled"

    import time as _t

    def _mark(msg):
        print(f"[w{pid} +{_t.time()-_T0:.0f}s] {msg}", flush=True)

    _mark("compiling+running dp train step")
    step = make_train_step(system, donate=False)
    state, logs = step(state, batch)
    logs = {k: float(v) for k, v in jax.device_get(logs).items()}

    _mark("dp step done; pulling replicated params")
    # 2a. replicated (dp) pull: identical full copies on every host
    hl = host_local_variables(state.g_vars)
    k = hl["params"]["initial"]["kernel"]
    assert isinstance(k, np.ndarray), type(k)
    digest = float(np.abs(k).sum())

    # 2b. TENSOR-SHARDED pull: a fresh state sharded over a dp4×tp2 mesh
    # (min_shard_ch lowered so the tiny 64-ch trunk actually shards); the
    # all-gather inside host_local_variables must reconstruct the exact
    # pre-sharding values on every host.
    _mark("tp shard + all-gather pull")
    tp_exp = exp.replace(mesh=MeshConfig(4, 2))
    tp_mesh = make_mesh(tp_exp.mesh)
    tp_state_local = create_train_state(system, jax.random.PRNGKey(0))
    ref_leaves = jax.tree_util.tree_leaves(
        jax.device_get(tp_state_local.g_vars))
    ref_tp_digest = float(sum(np.abs(x).sum() for x in ref_leaves))
    tp_state = shard_train_state(tp_state_local, tp_mesh, shard_model=True,
                                 min_shard_ch=2)
    n_sharded = sum(
        1 for x in jax.tree_util.tree_leaves(tp_state.g_vars)
        if isinstance(x, jax.Array) and not x.sharding.is_fully_addressable
        and not x.sharding.is_fully_replicated)
    assert n_sharded > 0, "tp test sharded nothing — gather path untested"
    hl_tp_g = host_local_variables(tp_state.g_vars)
    hl_tp_e = host_local_variables(tp_state.e_vars)
    got = jax.tree_util.tree_leaves(hl_tp_g)
    tp_digest = float(sum(np.abs(np.asarray(x)).sum() for x in got))
    assert all(isinstance(x, np.ndarray) or getattr(
        x, "sharding", None) is None or x.sharding.is_fully_addressable
        for x in got)
    assert tp_digest == ref_tp_digest, (tp_digest, ref_tp_digest)

    # 3. REAL multi-process Orbax save + restore of the stepped dp state
    from deepsee_tpu.utils.checkpoint import CheckpointManager

    _mark("orbax save/restore")
    ckpt = CheckpointManager(exp)
    ckpt.save(int(state.step), state, tag="latest")
    template = shard_train_state(
        create_train_state(system, jax.random.PRNGKey(1)),
        mesh, shard_model=False)
    restored = ckpt.restore(template)
    hl_restored = host_local_variables(restored.g_vars)
    restored_digest = float(
        np.abs(hl_restored["params"]["initial"]["kernel"]).sum())
    assert restored_digest == digest, (restored_digest, digest)
    ckpt.close()

    # 4. REAL cross-host evaluator sweep: each host runs its stripe of the
    # deterministic synthetic set; run() gathers with the genuine
    # process_allgather.  Variables come from the tp state via the
    # all-gather pull — exactly the dp×tp in-training eval path.
    from deepsee_tpu.data import DataLoader, SyntheticDataset
    from deepsee_tpu.eval.evaluator import InferenceEvaluator

    _mark("evaluator sweep")
    ds = SyntheticDataset(exp, length=8)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                        num_workers=1, prefetch=0,
                        shard_index=pid, num_shards=nproc)
    ev = InferenceEvaluator(system, num_samples=8, compute_fid=False,
                            compute_lpips=False)
    ev_vars = jax.device_put(
        SystemVariables(g=hl_tp_g, e=hl_tp_e, d=None, vgg=None),
        jax.local_devices()[0])
    ev_result = ev.run(ev_vars, loader)
    ev_result = {k: float(v) for k, v in ev_result.items()}

    print("MHRESULT " + json.dumps(
        {"pid": pid, "logs": logs, "hl_digest": digest,
         "tp_digest": tp_digest, "n_tp_sharded": n_sharded,
         "restored_digest": restored_digest,
         "eval": ev_result}), flush=True)


if __name__ == "__main__":
    main()
