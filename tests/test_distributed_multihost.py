"""REAL multi-process multi-host test (no monkeypatched process_index).

Spawns two worker processes that each own 4 CPU devices, initialize
jax.distributed against a local coordinator, form one 8-device global
mesh, feed per-host batch stripes through shard_batch's
make_array_from_process_local_data path, and run the fused GAN train
step with cross-process collectives.  Both workers — and a single-process
8-device run of the same global batch in THIS process — must produce
identical losses.

This is the strongest form of the reference's replicate-and-compare
SyncBN pattern (SURVEY §4): not simulated hosts, actual separate
processes with a real collective backend.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mh_worker.py")

pytestmark = pytest.mark.slow  # ~5 min: real jax.distributed processes


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same global batch on this process's 8-device mesh."""
    from deepsee_tpu.config import MeshConfig, tiny_test_experiment
    from deepsee_tpu.parallel import (make_mesh, shard_batch,
                                      shard_train_state)
    from deepsee_tpu.system import SRSystem
    from deepsee_tpu.train import create_train_state, make_train_step

    exp = tiny_test_experiment()
    exp = exp.replace(mesh=MeshConfig(8, 1), train=exp.train.__class__(
        **{**exp.train.__dict__, "batch_size": 8}))
    system = SRSystem(exp)
    mesh = make_mesh(exp.mesh)
    state = create_train_state(system, jax.random.PRNGKey(0))
    state = shard_train_state(state, mesh, shard_model=False)

    rng = np.random.RandomState(0)
    cfg = exp.model
    batch = {
        "image_hr": np.tanh(
            rng.randn(8, cfg.crop_size, cfg.crop_size, 3)).astype(
                np.float32),
        "label": rng.randint(0, cfg.label_nc,
                             (8, cfg.crop_size, cfg.crop_size)).astype(
                                 np.int32),
    }
    b = shard_batch(batch, mesh)
    step = make_train_step(system, donate=False)
    _, logs = step(state, b)
    return {k: float(v) for k, v in jax.device_get(logs).items()}


def _single_process_eval():
    """Same evaluator sweep, same init, unsharded single-process loader."""
    from deepsee_tpu.config import tiny_test_experiment
    from deepsee_tpu.data import DataLoader, SyntheticDataset
    from deepsee_tpu.eval.evaluator import InferenceEvaluator
    from deepsee_tpu.system import SRSystem, SystemVariables
    from deepsee_tpu.train import create_train_state

    exp = tiny_test_experiment()
    exp = exp.replace(train=exp.train.__class__(
        **{**exp.train.__dict__, "batch_size": 8}))
    system = SRSystem(exp)
    state = create_train_state(system, jax.random.PRNGKey(0))
    ds = SyntheticDataset(exp, length=8)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                        num_workers=1, prefetch=0)
    ev = InferenceEvaluator(system, num_samples=8, compute_fid=False,
                            compute_lpips=False)
    result = ev.run(SystemVariables(g=state.g_vars, e=state.e_vars,
                                    d=None, vgg=None), loader)
    return {k: float(v) for k, v in result.items()}


def test_two_process_distributed_matches_single_process(tmp_path):
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count

    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", coord, str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for pid in range(2)]
    try:
        # generous bound: two workers share the CI host's cores and each
        # compiles the fused step + the eval sweep (lifecycle coverage)
        outs = [p.communicate(timeout=1500)[0] for p in procs]
    finally:
        for p in procs:  # don't leak wedged workers / the coordinator port
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results, digests, rows = {}, {}, {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MHRESULT ")]
        assert line, f"no result line in:\n{out[-2000:]}"
        r = json.loads(line[-1][len("MHRESULT "):])
        results[r["pid"]] = r["logs"]
        digests[r["pid"]] = r["hl_digest"]
        rows[r["pid"]] = r

    # host_local_variables pulled identical full param copies on each host
    assert digests[0] == digests[1] and digests[0] > 0

    assert set(results) == {0, 1}
    # both hosts see the same global losses...
    for k in results[0]:
        np.testing.assert_allclose(results[0][k], results[1][k], rtol=0,
                                   atol=0, err_msg=k)
    # ...and they equal the single-process 8-device run bit-for-bit
    ref = _single_process_reference()
    for k, v in ref.items():
        np.testing.assert_allclose(results[0][k], v, rtol=1e-6, atol=1e-7,
                                   err_msg=k)

    # tensor-sharded all-gather pull: something was really sharded, and the
    # gather reproduced the pre-sharding values exactly on both hosts
    # (worker asserts tp_digest == its local unsharded reference)
    for pid in (0, 1):
        assert rows[pid]["n_tp_sharded"] > 0
    assert rows[0]["tp_digest"] == rows[1]["tp_digest"] > 0

    # the REAL multi-process Orbax round trip reproduced the stepped params
    for pid in (0, 1):
        assert rows[pid]["restored_digest"] == digests[pid]

    # the REAL cross-host evaluator gather: both hosts report identical
    # aggregate metrics over the full 8 samples, equal to a single-process
    # sweep of the same data with the same init
    ev0, ev1 = rows[0]["eval"], rows[1]["eval"]
    assert ev0["n_samples"] == 8
    ref_eval = _single_process_eval()
    for k in ref_eval:
        if k == "eval_seconds":
            continue
        np.testing.assert_allclose(ev0[k], ev1[k], rtol=1e-6,
                                   err_msg=f"hosts disagree on {k}")
        np.testing.assert_allclose(ev0[k], ref_eval[k], rtol=1e-5,
                                   atol=1e-6, err_msg=f"vs single-proc {k}")
