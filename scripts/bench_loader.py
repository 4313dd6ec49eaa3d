#!/usr/bin/env python
"""Host data-pipeline throughput benchmark (decode + transforms, no device).

The reference feeds its GPUs with `nThreads` DataLoader worker processes
(/root/reference/data/__init__.py:44-53); this repo decodes in a PIL thread
pool (deepsee_tpu/data/loader.py).  The device rates that pipeline must
feed (ARCHITECTURE.md): 100.9 img/s bf16 inference, 141.2 img/s int8
serving, ~220 img/s eval sweep, 15.6 img/s 256px training.

  python scripts/bench_loader.py --n_files 192 --workers 1,2,4,8

Generates a CelebAMask-HQ-shaped on-disk dataset once (1024px JPEG q95
images + 512px PNG label maps — the real dataset's formats and sizes),
then measures end-to-end DataLoader throughput (decode -> PIL transforms ->
collate) at 256px for each worker count.  Prints one JSON line per run.

NOTE on host size: PIL releases the GIL during JPEG/PNG decode, so the
thread pool scales with physical cores.  On a 1-core dev box the sweep
measures per-core throughput; a real v5e host has >100 vCPUs, so compare
`img_per_s * available_cores` against the device rates (the JSON carries
`cpu_count` so the basis is explicit).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n: int, image_px: int = 1024,
                 label_px: int = 512, seed: int = 0) -> None:
    """Blobby JPEGs (realistic compressed size, not noise-incompressible)
    + blocky label PNGs, CelebAMask-HQ naming (<id>.jpg / <id>.png)."""
    from PIL import Image

    img_dir = os.path.join(root, "images")
    lab_dir = os.path.join(root, "labels")
    if (os.path.isdir(img_dir)
            and len([f for f in os.listdir(img_dir)
                     if f.endswith(".jpg")]) >= n):
        return
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        small = rng.randint(0, 255, (32, 32, 3), np.uint8)
        img = Image.fromarray(small).resize((image_px, image_px),
                                            Image.BICUBIC)
        img.save(os.path.join(img_dir, f"{i}.jpg"), quality=95)
        lab_small = rng.randint(0, 19, (64, 64), np.uint8)
        lab = Image.fromarray(lab_small).resize((label_px, label_px),
                                                Image.NEAREST)
        lab.save(os.path.join(lab_dir, f"{i}.png"))
    # identities CSV (groups of 4) so guided presets can run too
    with open(os.path.join(root, "identities.csv"), "w") as f:
        f.write("hq_file_id,identity\n")
        for i in range(n):
            f.write(f"{i},{i // 4}\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/deepsee_loader_bench")
    p.add_argument("--n_files", type=int, default=192)
    p.add_argument("--name", default="8x_independent_256x256")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--workers", default="1,2,4,8")
    p.add_argument("--epochs", type=int, default=2,
                   help="timed passes (first pass warms the page cache)")
    p.add_argument("--native", choices=["off", "auto", "on"], default="off",
                   help="use the C codec (deepsee_tpu/native; bit-exact "
                        "with PIL).  'on' builds/requires it")
    p.add_argument("--scaled_decode", action="store_true",
                   help="with --native: approximate DCT-scaled JPEG decode "
                        "(the opt-in serving fast path, ~45 dB vs exact)")
    args = p.parse_args()

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.data import DataLoader, create_dataset

    if args.native == "on":
        from deepsee_tpu import native
        if not native.available(build_if_missing=True):
            raise SystemExit("--native on: libdeepsee_native.so build failed")

    make_dataset(args.root, args.n_files)

    exp = get_preset(args.name)
    exp = exp.replace(data=dataclasses.replace(
        exp.data, image_dir=os.path.join(args.root, "images"),
        label_dir=os.path.join(args.root, "labels"),
        identities_file=os.path.join(args.root, "identities.csv"),
        no_pairing_check=True, native_codec=args.native,
        native_scaled_decode=args.scaled_decode))
    dataset = create_dataset(exp, phase="train")

    # warm the OS page cache so we measure decode, not cold disk
    for i in range(min(len(dataset), args.n_files)):
        with open(dataset.image_paths[i], "rb") as f:
            f.read()
        with open(dataset.label_paths[i], "rb") as f:
            f.read()

    for workers in (int(w) for w in args.workers.split(",")):
        loader = DataLoader(dataset, args.batch_size, shuffle=True,
                            drop_last=True, num_workers=workers, prefetch=2)
        n_img = 0
        t0 = None
        for _ in range(args.epochs):
            for batch in loader:
                if t0 is None:  # clock starts after the first batch lands
                    t0 = time.perf_counter()
                    continue
                n_img += batch["image_hr"].shape[0]
        if t0 is None or n_img == 0:
            raise SystemExit(
                "need at least two batches to time (the first is warmup); "
                "raise --n_files/--epochs or lower --batch_size")
        dt = time.perf_counter() - t0
        ips = n_img / dt
        print(json.dumps({
            "metric": "loader_images_per_sec",
            "config": args.name, "batch": args.batch_size,
            "num_workers": workers, "n_files": args.n_files,
            "img_per_s": round(ips, 1),
            "ms_per_image": round(1000.0 / ips, 2),
            "cpu_count": os.cpu_count(),
            "native": args.native,
            "scaled_decode": bool(args.scaled_decode),
        }))


if __name__ == "__main__":
    main()
