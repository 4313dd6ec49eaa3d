"""Evaluation harness — the InferenceManager equivalent.

Mirrors managers/inference_manager.py: batched no-grad inference sweep
collecting PSNR/SSIM/MS-SSIM/RMSE (+LPIPS when weights allow), InceptionV3
pool3 activations for FID, per-sample CSV, fid-stats .npz dumps, skipped
samples, and the FID-500 fallback on numerical failure
(inference_manager.py:124-129).

TPU-first: one jitted step computes the fake image AND all per-sample
metrics AND both activation vectors in a single compiled sweep — the
reference loops per sample over cv2/torch calls on host.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepsee_tpu.config import Experiment
from deepsee_tpu.eval import fid as fid_mod
from deepsee_tpu.eval import lpips as lpips_mod
from deepsee_tpu.eval.metrics import (MetricsAccumulator, ms_ssim, psnr,
                                      rmse, ssim_matlab, to_uint8_values)
from deepsee_tpu.system import SRSystem


def get_validation_loader(exp: Experiment, batch_size: Optional[int] = None):
    """Dataloader over the *_val dirs (evaluation.py:202-217)."""
    import dataclasses

    from deepsee_tpu.data import DataLoader, create_dataset

    assert exp.data.label_dir_val and exp.data.image_dir_val, (
        "label_dir_val / image_dir_val required for validation evaluation")
    val_exp = exp.replace(data=dataclasses.replace(
        exp.data, label_dir=exp.data.label_dir_val,
        image_dir=exp.data.image_dir_val, phase="val"))
    ds = create_dataset(val_exp, phase="val")
    import jax
    return DataLoader(ds, batch_size or exp.train.batch_size, shuffle=False,
                      drop_last=False, shard_index=jax.process_index(),
                      num_shards=jax.process_count())


def evaluate_set(evaluator: "InferenceEvaluator", variables, loader,
                 default_fid: float = 500.0) -> Dict[str, float]:
    """Run evaluation with the reference's exhaustion fallback
    (evaluation.py:220-262: StopIteration -> FID 500)."""
    try:
        return evaluator.run(variables, loader)
    except StopIteration:
        print("[!Exception] iterator exhausted during evaluation; "
              f"logging default FID {default_fid} and continuing...")
        return {"FID": default_fid}


class MetricsCSVWriter:
    """Per-sample metrics CSV (evaluation.py:159-199)."""

    def __init__(self, folder: str, columns, append: bool = False):
        os.makedirs(folder, exist_ok=True)
        self.path = os.path.join(folder, "metrics.csv")
        exists = os.path.exists(self.path)
        self.file = open(self.path, "a" if append else "w")
        if not (append and exists):
            self.append_line(columns)

    def append_line(self, row):
        self.file.write(",".join(map(str, row)) + os.linesep)
        self.file.flush()

    def close(self):
        self.file.close()


class InferenceEvaluator:
    def __init__(self, system: SRSystem, num_samples: int,
                 write_details: bool = False, folder_out: Optional[str] = None,
                 compute_fid: bool = True, compute_lpips: bool = True,
                 inception_weights: Optional[str] = None,
                 alexnet_weights: Optional[str] = None,
                 lpips_lin_weights: Optional[str] = None):
        self.system = system
        self.exp = system.exp
        self.num_samples = num_samples
        self.batch_size = self.exp.train.batch_size
        self.write = write_details
        self.folder_out = folder_out
        self.compute_fid = compute_fid
        self.compute_lpips = compute_lpips

        self.writer = None
        if write_details:
            assert folder_out
            self.writer = MetricsCSVWriter(
                folder_out, ["ID", "PSNR", "SSIM", "MSSSIM", "RMSE", "LPIPS"])

        if compute_fid:
            self.inception_params, self.fid_exact = fid_mod.load_inception_params(
                inception_weights)
        if compute_lpips:
            self.lpips_params, self.lpips_exact = lpips_mod.load_lpips_params(
                lpips_lin_weights, alexnet_weights)

        self._infer = jax.jit(self._infer_impl)
        self._metrics = jax.jit(self._metrics_impl)

    def _infer_impl(self, g_vars, e_vars, batch):
        pre = self.system.preprocess(batch)
        # sr_model.py:85-91 'inference': no_noise=True; the independent model
        # takes the mini (LR) style path at eval unless --full_style_image
        # (encode_full=opt.full_style_image, self.training=False at
        # sr_model.py:616); guided always encodes the full style image.
        cfg = self.system.cfg
        use_full = (cfg.model_variant == "guided") or cfg.full_style_image
        fake, _, _ = self.system.generate(
            g_vars, e_vars, pre, use_full=use_full, no_noise=True, train=False)
        return fake, pre["image_hr"]

    def _metrics_impl(self, fake, real):
        f255 = to_uint8_values(fake)
        r255 = to_uint8_values(real)
        out = {
            "rmse": rmse(fake, real),
            "psnr": psnr(f255, r255),
            "ssim": ssim_matlab(f255, r255),
            "ms_ssim": ms_ssim((fake + 1.0) * 127.5, (real + 1.0) * 127.5),
        }
        if self.compute_lpips:
            out["lpips"] = lpips_mod.lpips(self.lpips_params, fake, real)
        if self.compute_fid:
            out["act_fake"] = fid_mod.inception_pool3(self.inception_params,
                                                      fake)
            out["act_real"] = fid_mod.inception_pool3(self.inception_params,
                                                      real)
        return out

    def run_batch(self, variables, batch) -> Dict[str, np.ndarray]:
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                        if not isinstance(v, list)}
        fake, real = self._infer(variables.g, variables.e, device_batch)
        return fake, real

    def run(self, variables, dataloader: Iterable) -> Dict[str, float]:
        start = time.time()
        acc = MetricsAccumulator()
        act_fake, act_real = [], []
        n_seen = 0

        for batch in dataloader:
            if n_seen >= self.num_samples:
                break
            fake, real = self.run_batch(variables, batch)
            m = jax.device_get(self._metrics(fake, real))
            acc.add("psnr", m["psnr"])
            acc.add("ssim", m["ssim"])
            acc.add("ms_ssim", m["ms_ssim"])
            acc.add("rmse", m["rmse"])
            if self.compute_lpips:
                acc.add("lpips", m["lpips"])
            if self.compute_fid:
                act_fake.append(m["act_fake"])
                act_real.append(m["act_real"])
            if self.writer is not None:
                paths = batch.get("path", [""] * len(m["psnr"]))
                for i in range(len(m["psnr"])):
                    self.writer.append_line([
                        os.path.splitext(os.path.basename(paths[i]))[0],
                        m["psnr"][i], m["ssim"][i], m["ms_ssim"][i],
                        m["rmse"][i],
                        m["lpips"][i] if self.compute_lpips else ""])
            n_seen += len(m["psnr"])

        result: Dict[str, float] = {}
        if self.compute_fid and act_fake:
            af = np.concatenate(act_fake, 0)
            ar = np.concatenate(act_real, 0)
            if self.write and self.folder_out:
                for arr, tag in ((af, "fake"), (ar, "real")):
                    mu, sigma = fid_mod.calculate_statistics(arr)
                    np.savez_compressed(
                        os.path.join(self.folder_out,
                                     f"fid_stats_{len(arr)}samples_{tag}.npz"),
                        mu=mu, sigma=sigma)
            try:
                result["FID"] = fid_mod.fid_from_activations(af, ar)
            except Exception as e:  # noqa: BLE001 (reference behavior)
                print(f"FID failed ({e}); logging default 500")
                result["FID"] = 500.0

        result.update(acc.result())
        result["eval_seconds"] = time.time() - start
        return result
