#!/usr/bin/env python
"""Standalone folder evaluation (reference: evaluator/evaluate_folder.py).

Compares a folder of generated PNGs against a ground-truth folder:
PSNR / SSIM / MS-SSIM / RMSE / LPIPS / FID, with dataset-specific
center-crop/resize of the GT (evaluate_folder.py:199-207), and writes a
per-sample metrics.csv plus printed mean/std.

  python evaluate_folder.py --fake_dir results/visuals/fake_image \\
      --real_dir /data/CelebAMask-HQ/images --dataset celebamaskhq \\
      --crop_size 256 --out metrics_out/
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from PIL import Image

import jax.numpy as jnp


def load_real(path: str, dataset: str, crop_size: int,
              center_crop_size: int = 178) -> np.ndarray:
    """Dataset-specific GT preprocessing (evaluate_folder.py:199-207).
    Decodes with the native codec when built (bit-exact; PIL fallback)."""
    try:
        from deepsee_tpu import native
        from deepsee_tpu.native import codec as ncodec
    except Exception:
        native = None
    if native is not None and native.available():
        ops = ncodec.make_ops(
            center_crop=center_crop_size if dataset == "celeba" else 0,
            resize=(crop_size, crop_size))
        arr = ncodec.decode_image(path, ops, (crop_size, crop_size))
        if arr is not None:
            return arr
    img = Image.open(path).convert("RGB")
    if dataset == "celeba":
        w, h = img.size
        cc = center_crop_size
        left, top = int(round((w - cc) / 2.0)), int(round((h - cc) / 2.0))
        img = img.crop((left, top, left + cc, top + cc))
    if img.size != (crop_size, crop_size):
        img = img.resize((crop_size, crop_size), Image.BICUBIC)
    return np.asarray(img, np.float32) / 255.0 * 2.0 - 1.0


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fake_dir", required=True)
    p.add_argument("--real_dir", required=True)
    p.add_argument("--dataset", default="celebamaskhq",
                   choices=("celeba", "celebamaskhq"))
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--center_crop_size", type=int, default=178)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--no_fid", action="store_true")
    p.add_argument("--no_lpips", action="store_true")
    p.add_argument("--inception_weights", default="")
    p.add_argument("--alexnet_weights", default="")
    p.add_argument("--out", default="")
    from deepsee_tpu.utils.compile_cache import (add_cache_args,
                                                 apply_cache_args)
    add_cache_args(p)
    args = p.parse_args()
    apply_cache_args(args)

    from deepsee_tpu.eval import fid as fid_mod
    from deepsee_tpu.eval import lpips as lpips_mod
    from deepsee_tpu.eval.evaluator import MetricsCSVWriter
    from deepsee_tpu.eval.metrics import (MetricsAccumulator, ms_ssim, psnr,
                                          rmse, ssim_matlab, to_uint8_values)
    import jax

    fake_paths = sorted(glob.glob(os.path.join(args.fake_dir, "*.png")) +
                        glob.glob(os.path.join(args.fake_dir, "*.jpg")))
    if args.max_samples:
        fake_paths = fake_paths[:args.max_samples]
    assert fake_paths, f"No images in {args.fake_dir}"

    if not args.no_fid:
        inception_params, fid_exact = fid_mod.load_inception_params(
            args.inception_weights or None)
        if not fid_exact:
            print("[warn] FID inception weights unavailable — "
                  "relative FID only")
    if not args.no_lpips:
        lpips_params, lpips_exact = lpips_mod.load_lpips_params(
            alexnet_path=args.alexnet_weights or None)
        if not lpips_exact:
            print("[warn] LPIPS alexnet weights unavailable — "
                  "relative LPIPS only")

    @jax.jit
    def metrics_fn(fake, real):
        f255, r255 = to_uint8_values(fake), to_uint8_values(real)
        out = {"rmse": rmse(fake, real), "psnr": psnr(f255, r255),
               "ssim": ssim_matlab(f255, r255),
               "ms_ssim": ms_ssim((fake + 1) * 127.5, (real + 1) * 127.5)}
        if not args.no_lpips:
            out["lpips"] = lpips_mod.lpips(lpips_params, fake, real)
        if not args.no_fid:
            out["act_fake"] = fid_mod.inception_pool3(inception_params, fake)
            out["act_real"] = fid_mod.inception_pool3(inception_params, real)
        return out

    writer = None
    if args.out:
        writer = MetricsCSVWriter(
            args.out, ["ID", "PSNR", "SSIM", "MSSSIM", "RMSE", "LPIPS"])

    acc = MetricsAccumulator()
    act_fake, act_real = [], []
    batch_f, batch_r, batch_ids = [], [], []

    def flush():
        if not batch_f:
            return
        m = jax.device_get(metrics_fn(jnp.asarray(np.stack(batch_f)),
                                      jnp.asarray(np.stack(batch_r))))
        for name in ("psnr", "ssim", "ms_ssim", "rmse"):
            acc.add(name, m[name])
        if not args.no_lpips:
            acc.add("lpips", m["lpips"])
        if not args.no_fid:
            act_fake.append(m["act_fake"])
            act_real.append(m["act_real"])
        if writer:
            for i, sid in enumerate(batch_ids):
                writer.append_line([
                    sid, m["psnr"][i], m["ssim"][i], m["ms_ssim"][i],
                    m["rmse"][i],
                    m["lpips"][i] if not args.no_lpips else ""])
        batch_f.clear(), batch_r.clear(), batch_ids.clear()

    missing = 0
    for fp in fake_paths:
        stem = os.path.splitext(os.path.basename(fp))[0]
        rp = None
        for ext in (".jpg", ".png", ".jpeg"):
            cand = os.path.join(args.real_dir, stem + ext)
            if os.path.exists(cand):
                rp = cand
                break
        if rp is None:
            missing += 1
            continue
        fake = np.asarray(Image.open(fp).convert("RGB"), np.float32)
        fake = fake / 255.0 * 2.0 - 1.0
        batch_f.append(fake)
        batch_r.append(load_real(rp, args.dataset, args.crop_size,
                                 args.center_crop_size))
        batch_ids.append(stem)
        if len(batch_f) == args.batch_size:
            flush()
    flush()

    result = {}
    if not args.no_fid and act_fake:
        try:
            result["FID"] = fid_mod.fid_from_activations(
                np.concatenate(act_fake), np.concatenate(act_real))
        except Exception as e:  # noqa: BLE001
            print(f"FID failed ({e}); default 500")
            result["FID"] = 500.0
    result.update(acc.result())
    if missing:
        print(f"[warn] {missing} fake images had no GT counterpart")
    for k, v in result.items():
        print(f"{k}: {v}")
    return result


if __name__ == "__main__":
    main()
