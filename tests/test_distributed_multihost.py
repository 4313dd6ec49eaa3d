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


def test_two_process_distributed_matches_single_process():
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count

    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for pid in range(2)]
    try:
        outs = [p.communicate(timeout=540)[0] for p in procs]
    finally:
        for p in procs:  # don't leak wedged workers / the coordinator port
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results, digests = {}, {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MHRESULT ")]
        assert line, f"no result line in:\n{out[-2000:]}"
        r = json.loads(line[-1][len("MHRESULT "):])
        results[r["pid"]] = r["logs"]
        digests[r["pid"]] = r["hl_digest"]

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
