"""Evaluation harness — the InferenceManager equivalent.

Mirrors managers/inference_manager.py: batched no-grad inference sweep
collecting PSNR/SSIM/MS-SSIM/RMSE (+LPIPS when weights allow), InceptionV3
pool3 activations for FID, per-sample CSV, fid-stats .npz dumps, skipped
samples, and the FID-500 fallback on numerical failure
(inference_manager.py:124-129).

TPU-first: one jitted step computes the fake image AND all per-sample
metrics AND both activation vectors in a single compiled sweep — the
reference loops per sample over cv2/torch calls on host.

Multi-host: the val/eval DataLoaders are sharded per process (each host
sweeps a 1/N stride); `run` gathers every host's per-sample metric values
and Inception activations before aggregating, so the reported mean/std and
FID cover the full `num_samples` regardless of process count.  The
per-sample CSV covers the main host's stripe only (paths are host-local).
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
from deepsee_tpu.utils.files import is_main_process


def _gather_across_hosts(tree):
    """Concatenate equal-shape per-host arrays along axis 0 (process order).
    Identity in single-process runs."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return jax.tree_util.tree_map(
        np.asarray, multihost_utils.process_allgather(tree, tiled=True))


def _pad_rows(arr: np.ndarray, n: int) -> np.ndarray:
    """Pad (or truncate) axis 0 to exactly n rows; padding is zeros (rows
    beyond the validity mask are dropped after the gather)."""
    if arr.shape[0] >= n:
        return arr[:n]
    pad = np.zeros((n - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], 0)


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
        if write_details and is_main_process():
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
        # One fused dispatch for the sweep loop: generate + all metrics +
        # both Inception activation sets in a single compiled program (the
        # split _infer/_metrics pair stays for callers that need the images).
        self._sweep = jax.jit(
            lambda g, e, b: self._metrics_impl(*self._infer_impl(g, e, b)))
        # In-flight batches during `run`: the host preps/transfers batch N+1
        # while the device computes batch N.  Kept small — deep independent
        # enqueue chains can hang the axon tunnel (see CLAUDE.md).
        self.pipeline_depth = 2

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
        metric_names = ["psnr", "ssim", "ms_ssim", "rmse"] + (
            ["lpips"] if self.compute_lpips else [])
        rows: Dict[str, list] = {name: [] for name in metric_names}
        act_fake, act_real = [], []
        n_seen = 0
        # each host sweeps its 1/N stripe; together they cover num_samples
        local_target = -(-self.num_samples // jax.process_count())

        from collections import deque
        pending: deque = deque()  # (paths, device-resident metrics dict)

        def drain_one():
            paths, mdev = pending.popleft()
            m = jax.device_get(mdev)
            for name in metric_names:
                rows[name].append(np.atleast_1d(np.asarray(m[name])))
            if self.compute_fid:
                act_fake.append(m["act_fake"])
                act_real.append(m["act_real"])
            if self.writer is not None:
                for i in range(len(m["psnr"])):
                    self.writer.append_line([
                        os.path.splitext(os.path.basename(paths[i]))[0],
                        m["psnr"][i], m["ssim"][i], m["ms_ssim"][i],
                        m["rmse"][i],
                        m["lpips"][i] if self.compute_lpips else ""])

        for batch in dataloader:
            if n_seen >= local_target:
                break
            device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                            if not isinstance(v, list)}
            bsize = int(device_batch["image_hr"].shape[0])
            mdev = self._sweep(variables.g, variables.e, device_batch)
            pending.append((batch.get("path", [""] * bsize), mdev))
            n_seen += bsize
            while len(pending) >= self.pipeline_depth:
                drain_one()
        while pending:
            drain_one()

        local = {name: (np.concatenate(v, 0) if v
                        else np.zeros((0,), np.float32))
                 for name, v in rows.items()}
        if self.compute_fid:
            dim = fid_mod.POOL3_DIM
            local["act_fake"] = (np.concatenate(act_fake, 0) if act_fake
                                 else np.zeros((0, dim), np.float32))
            local["act_real"] = (np.concatenate(act_real, 0) if act_real
                                 else np.zeros((0, dim), np.float32))
        merged = self._merge_hosts(local, local_target)
        # clamp to EXACTLY num_samples so results are invariant to process
        # count and batch shape: multi-host ceil-division can deliver up to
        # nproc-1 extra rows and a single host's last batch can overshoot by
        # batch_size-1.  (Deliberate deviation: the reference itself sweeps
        # num_samples//batch+1 batches, inference_manager.py:71, so ITS
        # numbers cover ~num_samples+batch rows — ours cover num_samples.)
        merged = {k: v[:self.num_samples] for k, v in merged.items()}

        acc = MetricsAccumulator()
        for name in metric_names:
            if len(merged[name]):
                acc.add(name, merged[name])

        result: Dict[str, float] = {}
        if self.compute_fid and len(merged["act_fake"]):
            af = merged["act_fake"]
            ar = merged["act_real"]
            if self.write and self.folder_out and is_main_process():
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

    def _merge_hosts(self, local: Dict[str, np.ndarray],
                     local_target: int) -> Dict[str, np.ndarray]:
        """All-gather every host's per-sample rows.  Hosts may end with
        unequal counts (strided sharding, exhausted loaders), so rows are
        padded to local_target with an explicit validity mask and filtered
        after the gather.  No-op in single-process runs."""
        if jax.process_count() == 1:
            return local
        n_local = len(next(iter(local.values())))
        padded = {k: _pad_rows(v, local_target) for k, v in local.items()}
        padded["_valid"] = (np.arange(local_target) < n_local).astype(
            np.float32)
        gathered = _gather_across_hosts(padded)
        keep = gathered.pop("_valid") > 0.5
        return {k: v[keep] for k, v in gathered.items()}
