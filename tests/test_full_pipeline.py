"""End-to-end pipeline chain on the tiny config (CPU mesh).

Train -> Orbax checkpoint -> restore that SAME run into the demo driver,
the evaluator, and the AOT serving export, mirroring the reference's
lifecycle (train.py -> checkpoints/<name>/ -> demo.py / evaluate.py).
Each surface is unit-tested elsewhere; this proves the chain — the
artifacts training writes are the artifacts every downstream consumer
reads, with the trained weights actually flowing through.
"""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.data import DataLoader, SyntheticDataset
from deepsee_tpu.eval.evaluator import InferenceEvaluator
from deepsee_tpu.serve import (export_serving, load_serving,
                               make_serving_fns, save_serving)
from deepsee_tpu.system import SRSystem, SystemVariables
from deepsee_tpu.train.loop import Trainer
from deepsee_tpu.train.state import create_train_state
from deepsee_tpu.utils.checkpoint import CheckpointManager


def _restore_variables(train_exp):
    """The exact demo.py/evaluate.py --checkpoint restore recipe."""
    ckpt = CheckpointManager(train_exp)
    state = ckpt.restore(create_train_state(SRSystem(train_exp),
                                            jax.random.PRNGKey(0)))
    return state, SystemVariables(g=state.g_vars, e=state.e_vars,
                                  d=None, vgg=None)


@pytest.mark.parametrize("guided", [
    False, pytest.param(True, marks=pytest.mark.slow)])
def test_train_then_demo_evaluate_export(tmp_path, guided):
    exp = tiny_test_experiment().replace(checkpoints_dir=str(tmp_path))
    if guided:
        exp = exp.replace(name="tiny_test_guided",
                          model=dataclasses.replace(
                              exp.model, net_e="fullstyle",
                              guiding_style_image=True))
    exp = exp.replace(train=dataclasses.replace(
        exp.train, niter=1, niter_decay=0, print_freq=10**9,
        save_latest_freq=2, display_freq=10**9, evaluation_freq=10**9))
    cfg = exp.model

    # ---- train 2 steps; the loop's crash-save guarantees a checkpoint ----
    loader = DataLoader(SyntheticDataset(exp, length=4),
                        exp.train.batch_size, shuffle=False, drop_last=True,
                        num_workers=1, prefetch=0)
    trained = Trainer(exp).run(dataloader=loader, max_steps=2)
    assert int(trained.step) == 2

    state, variables = _restore_variables(exp)
    assert int(state.step) == 2
    trained_kernel = np.asarray(jax.device_get(
        variables.g["params"]["initial"]["kernel"]))

    # ---- demo from the trained checkpoint -------------------------------
    from demo import Demo

    infer_exp = exp.replace(is_train=False)
    rng = np.random.RandomState(0)
    lr_path = str(tmp_path / "lr.png")
    sem_path = str(tmp_path / "sem.png")
    hr_path = str(tmp_path / "hr.png")
    Image.fromarray(rng.randint(0, 255, (cfg.start_size, cfg.start_size, 3),
                                dtype=np.uint8)).save(lr_path)
    Image.fromarray(rng.randint(0, cfg.label_nc,
                                (cfg.crop_size, cfg.crop_size),
                                dtype=np.uint8)).save(sem_path)
    Image.fromarray(rng.randint(0, 255, (cfg.crop_size, cfg.crop_size, 3),
                                dtype=np.uint8)).save(hr_path)
    # the guided family's demo style source is a guiding HR image
    demo_kw = ({"inputs_hr": [{"path_image_hr": hr_path,
                               "path_semantics": sem_path}]}
               if guided else {})

    demo = Demo(infer_exp)
    random_init_kernel = np.asarray(jax.device_get(
        demo.variables.g["params"]["initial"]["kernel"]))
    # training moved the weights; loading must carry that into the demo
    assert np.abs(trained_kernel - random_init_kernel).max() > 0
    r_rand = demo.run(lr_path, sem_path, out_dir=str(tmp_path / "demo_rand"),
                      **demo_kw)
    demo.variables = variables
    r = demo.run(lr_path, sem_path, out_dir=str(tmp_path / "demo_out"),
                 **demo_kw)
    assert os.path.exists(r["save_path"])
    fake_demo = np.asarray(r["fake_image"])
    assert np.isfinite(fake_demo).all()
    assert np.abs(fake_demo - np.asarray(r_rand["fake_image"])).max() > 1e-6

    # ---- evaluator over a synthetic test loader -------------------------
    eval_loader = DataLoader(SyntheticDataset(infer_exp, length=2),
                             batch_size=2, shuffle=False, drop_last=True,
                             num_workers=1, prefetch=0)
    ev = InferenceEvaluator(SRSystem(infer_exp), num_samples=2,
                            compute_fid=False, compute_lpips=False)
    result = ev.run(variables, eval_loader)
    assert result["n_samples"] == 2
    for key in ("psnr/mean", "ssim/mean", "ms_ssim/mean", "rmse/mean"):
        assert np.isfinite(result[key]), (key, result)

    # ---- AOT serving export of the same trained weights -----------------
    serving_dir = str(tmp_path / "serving")
    blobs = export_serving(infer_exp, variables, batch_size=1,
                           platforms=("cpu",))
    save_serving(serving_dir, infer_exp, blobs, batch_size=1,
                 platforms=("cpu",))

    lr = jnp.asarray(np.tanh(rng.randn(1, cfg.start_size, cfg.start_size, 3)),
                     jnp.float32)
    lab = jnp.asarray(rng.randint(0, cfg.label_nc,
                                  (1, cfg.crop_size, cfg.crop_size)),
                      jnp.int32)
    hr = jnp.asarray(np.tanh(rng.randn(1, cfg.crop_size, cfg.crop_size, 3)),
                     jnp.float32)
    e2e_args = (lr, lab, hr, lab) if guided else (lr, lab)
    end_to_end, _ = make_serving_fns(SRSystem(infer_exp), variables)
    ref_fake, ref_style = jax.jit(end_to_end)(*e2e_args)
    fn = load_serving(serving_dir)
    fake, style = fn(*e2e_args)
    np.testing.assert_allclose(np.asarray(fake), np.asarray(ref_fake),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(style), np.asarray(ref_style),
                               rtol=1e-5, atol=1e-5)

    # ---- HTTP daemon over the exported trained-weights artifact ----------
    import base64
    import io
    import json as _json
    import urllib.request

    from deepsee_tpu.server import ServingServer

    def _png(arr_u8):
        buf = io.BytesIO()
        Image.fromarray(arr_u8).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode("ascii")

    srv = ServingServer(serving_dir, port=0, batch_window_ms=5.0)
    srv.start()
    try:
        body = {
            "image_lr": _png(rng.randint(
                0, 256, (cfg.start_size, cfg.start_size, 3), np.uint8)),
            "label": _png(rng.randint(
                0, cfg.label_nc,
                (cfg.crop_size, cfg.crop_size)).astype(np.uint8)),
        }
        if guided:
            body["guiding_image"] = _png(rng.randint(
                0, 256, (cfg.crop_size, cfg.crop_size, 3), np.uint8))
            body["guiding_label"] = body["label"]
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/super_resolve",
            data=_json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            resp = _json.loads(r.read())
        served = Image.open(io.BytesIO(base64.b64decode(resp["image"])))
        assert served.size == (cfg.crop_size, cfg.crop_size)
        assert np.asarray(resp["style"], np.float32).shape == (
            cfg.label_nc, cfg.regional_style_size)
    finally:
        srv.stop()
