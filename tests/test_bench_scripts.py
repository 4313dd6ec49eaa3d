"""Smoke tests for the measurement scripts (CLI-level, tiny inputs).

These scripts are run by hand against the real chip; a round-3 review
found two latent bugs in bench_loader.py (a dataset-cache check that
never matched and a ZeroDivision on one-batch runs) that a smoke like
this would have caught.  Keep them cheap: small file counts, CPU only.
"""

import pytest
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(argv, **env_extra):
    env = dict(os.environ, **env_extra)
    return subprocess.run([sys.executable] + argv, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=420)


def test_bench_loader_smoke(tmp_path):
    root = str(tmp_path / "ds")
    argv = ["scripts/bench_loader.py", "--root", root, "--n_files", "12",
            "--epochs", "3", "--batch_size", "4", "--workers", "1"]
    res = _run(argv)
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"] == "loader_images_per_sec"
    assert out["img_per_s"] > 0
    assert out["n_files"] == 12

    # dataset cache: a rerun must NOT regenerate the files
    mtime = os.path.getmtime(os.path.join(root, "images", "0.jpg"))
    res2 = _run(argv)
    assert res2.returncode == 0, res2.stderr[-2000:]
    assert os.path.getmtime(os.path.join(root, "images", "0.jpg")) == mtime

    # one-batch runs cannot be timed (first batch is warmup): explicit error
    res3 = _run(["scripts/bench_loader.py", "--root", root, "--n_files",
                 "12", "--epochs", "1", "--batch_size", "12",
                 "--workers", "1"])
    assert res3.returncode != 0
    assert "warmup" in (res3.stderr + res3.stdout)


@pytest.mark.slow
def test_bench_eval_smoke():
    res = _run(["scripts/bench_eval.py", "--name", "tiny_test",
                "--batch", "2", "--num_samples", "6", "--platform", "cpu"])
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"].startswith("eval_sweep_tiny_test")
    assert out["value"] > 0
    assert out["device_sweep_img_per_s"] > 0
    assert out["fid_sqrtm_seconds"] >= 0
    assert out["num_samples"] == 6


@pytest.mark.slow
def test_bench_server_smoke():
    res = _run(["scripts/bench_server.py", "--name", "tiny_test",
                "--trace_batch", "2", "--clients", "4",
                "--n_requests", "8", "--batch_window_ms", "20",
                "--platform", "cpu"])
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"] == "served_img_per_s_http"
    assert out["value"] > 0
    assert 0 < out["batch_fill"] <= 1
    assert out["latency_ms"]["p50"] > 0
