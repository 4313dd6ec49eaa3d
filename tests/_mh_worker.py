"""Subprocess worker for the real two-process multi-host test.

Each worker is one "host": jax.distributed.initialize + 4 forced CPU
devices; the pair forms an 8-device global mesh with cross-process Gloo
collectives — the honest analogue of a 2-host TPU pod.  Run by
tests/test_distributed_multihost.py, not directly.
"""

import json
import os
import sys


def main():
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
        " --xla_disable_hlo_passes=space-to-batch-converter").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from deepsee_tpu.config import MeshConfig, tiny_test_experiment
    from deepsee_tpu.parallel import (make_mesh, shard_batch,
                                      shard_train_state)
    from deepsee_tpu.system import SRSystem
    from deepsee_tpu.train import create_train_state, make_train_step

    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    exp = tiny_test_experiment()
    exp = exp.replace(mesh=MeshConfig(8, 1), train=exp.train.__class__(
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

    step = make_train_step(system, donate=False)
    state, logs = step(state, batch)
    logs = {k: float(v) for k, v in jax.device_get(logs).items()}

    # the in-training eval path: replicated global params must pull down
    # to identical host-local copies on every host (loop.eval_variables)
    from deepsee_tpu.parallel import host_local_variables

    hl = host_local_variables(state.g_vars)
    k = hl["params"]["initial"]["kernel"]
    assert isinstance(k, np.ndarray), type(k)
    digest = float(np.abs(k).sum())

    print("MHRESULT " + json.dumps(
        {"pid": pid, "logs": logs, "hl_digest": digest}), flush=True)


if __name__ == "__main__":
    main()
