#!/usr/bin/env python
"""On-device training driven by an ON-DISK image corpus — the reference's
only operating mode (train.py:23-44 -> data/__init__.py:41 ->
CelebA(MaskHQ)Dataset -> base_dataset.py:87-107 PIL decode+transform per
sample) — with a synthetic A/B in the same process for the loader-feed
verdict: does the host decode pipeline (thread-pool + native C++ codec +
prefetch) keep the chip fed while the same host drives the device?

The CPU-mesh composition test lives in tests/test_train_from_disk.py; this
script executes it at a real preset's sizes on the TPU and prints one JSON
line of evidence:

  python scripts/train_from_disk.py --name 8x_independent_128x128 \
      --batch_size 8 --steps 32 [--remat]
  python scripts/train_from_disk.py --name 8x_guided_256x256 \
      --batch_size 4 --steps 16 --remat     # two decodes per sample

ms/step excludes compile (same jitted callable across both timed runs) and
subtracts a separately measured checkpoint save (both runs end in exactly
one crash-save).
"""

from __future__ import annotations

import argparse
import csv
import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_corpus(root: str, exp, n: int) -> object:
    """A real file tree in the exact on-disk format the preset's dataset
    class reads (celeba_dataset.py:19-40 / celebamaskhq_dataset.py:17-27)."""
    img_dir = os.path.join(root, "img")
    lab_dir = os.path.join(root, "lab")
    os.makedirs(img_dir), os.makedirs(lab_dir)
    rng = np.random.RandomState(0)
    d = exp.data
    if d.dataset == "celeba":
        ident = os.path.join(root, "identity_CelebA.txt")
        with open(ident, "w") as f:
            for i in range(n):
                stem = f"{i:06d}"
                Image.fromarray(rng.randint(0, 255, (218, 178, 3), np.uint8)
                                ).save(os.path.join(img_dir, stem + ".jpg"),
                                       quality=92)
                lab = rng.randint(0, 19, (218, 178), np.uint8)
                lab[0, 0] = 255  # unknown-label remap path
                Image.fromarray(lab).save(os.path.join(lab_dir,
                                                       stem + ".png"))
                f.write(f"{stem}.jpg {i % max(2, n // 2)}\n")
    else:  # celebamaskhq
        size = exp.model.load_size
        ident = os.path.join(root, "identities_all.csv")
        with open(ident, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["hq_file_id", "identity"])
            w.writeheader()
            for i in range(n):
                Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)
                                ).save(os.path.join(img_dir, f"{i}.jpg"),
                                       quality=92)
                Image.fromarray(rng.randint(0, 19, (size, size), np.uint8)
                                ).save(os.path.join(lab_dir, f"{i}.png"))
                w.writerow({"hq_file_id": str(i), "identity":
                            str(i % max(2, n // 2))})
    return dataclasses.replace(d, image_dir=img_dir, label_dir=lab_dir,
                               identities_file=ident)


def timed_steps(trainer, make_loader, steps: int):
    """Time the bare training-step loop — loader pull, host->device batch
    placement, fused jitted GAN step — with the sync a data-dependent scalar
    fetch from the LAST step's logs (the state chain is sequential, so it
    drains every step; `block_until_ready` lies on axon).  Checkpoint saves
    stay outside the window: Trainer.run's full hook composition is locked
    by tests/test_train_from_disk.py and executed by the warm run here."""
    import jax

    loader = make_loader() if make_loader else trainer.make_dataloader()
    it = iter(loader)
    logs = None
    t0 = time.perf_counter()
    for _ in range(steps):
        device_batch = trainer._device_batch(next(it))
        trainer.state, logs = trainer.step_gd(trainer.state, device_batch)
    sync = float(jax.device_get(logs["GAN"]))
    total_s = time.perf_counter() - t0
    assert np.isfinite(sync), sync
    return total_s / steps * 1000.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="8x_independent_128x128")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--warm", type=int, default=4)
    p.add_argument("--reps", type=int, default=3,
                   help="interleaved disk/synthetic timed repetitions")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--skip_synthetic", action="store_true")
    args = p.parse_args()

    import jax

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.data import DataLoader, SyntheticDataset
    from deepsee_tpu.native import load as load_native
    from deepsee_tpu.train.loop import Trainer
    from deepsee_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    bs = args.batch_size
    n_samples = bs * (args.warm + args.steps)

    work = tempfile.mkdtemp(prefix="deepsee_disk_")
    exp = get_preset(args.name).replace(checkpoints_dir=work)
    exp = exp.replace(train=dataclasses.replace(
        exp.train, batch_size=bs, remat=args.remat,
        niter=10**6, niter_decay=0, save_epoch_freq=10**9,
        print_freq=10**9, display_freq=10**9, save_latest_freq=10**9,
        evaluation_freq=10**9))

    t0 = time.perf_counter()
    exp = exp.replace(data=write_corpus(work, exp, n_samples))
    gen_s = time.perf_counter() - t0
    backend = jax.default_backend()
    print(f"[disk] backend={backend} corpus: {n_samples} samples "
          f"({gen_s:.0f}s) native_codec={load_native() is not None}",
          flush=True)

    # ---- disk-fed: Trainer builds its own loader (the reference's
    # composition: run -> make_dataloader -> create_dataset -> decode).
    # Timed runs are INTERLEAVED disk/synthetic so slow drift in the axon
    # tunnel's per-step transfer cost (which dominates absolute ms/step on
    # this host) cancels out of the disk-vs-synthetic comparison.
    trainer = Trainer(exp)
    trainer.run(None, max_steps=args.warm)  # compile + warm

    trainer_s = None
    syn_loader = None
    if not args.skip_synthetic:
        exp_s = exp.replace(name=exp.name + "_syn")
        trainer_s = Trainer(exp_s)

        def syn_loader():
            return DataLoader(SyntheticDataset(exp_s, length=n_samples), bs,
                              shuffle=False, drop_last=True, num_workers=1)

        trainer_s.run(syn_loader(), max_steps=args.warm)

    disk_ms_all, syn_ms_all = [], []
    for rep in range(args.reps):
        ms = timed_steps(trainer, None, args.steps)
        disk_ms_all.append(ms)
        print(f"[disk] rep {rep}: disk {ms:.1f} ms/step", flush=True)
        if trainer_s is not None:
            ms = timed_steps(trainer_s, syn_loader, args.steps)
            syn_ms_all.append(ms)
            print(f"[disk] rep {rep}: synthetic {ms:.1f} ms/step", flush=True)

    disk_ms = float(np.median(disk_ms_all))
    out = {
        "metric": "train_from_disk",
        "config": args.name, "backend": backend, "batch": bs,
        "remat": args.remat, "steps": args.steps, "reps": args.reps,
        "guided_two_decodes": exp.model.guiding_style_image,
        "native_codec": load_native() is not None,
        "disk_ms_per_step": round(disk_ms, 1),
        "disk_ms_per_step_all": [round(m, 1) for m in disk_ms_all],
        "disk_img_per_s": round(bs / disk_ms * 1000.0, 1),
    }
    if syn_ms_all:
        syn_ms = float(np.median(syn_ms_all))
        out["synthetic_ms_per_step"] = round(syn_ms, 1)
        out["synthetic_ms_per_step_all"] = [round(m, 1) for m in syn_ms_all]
        out["loader_overhead_pct"] = round((disk_ms / syn_ms - 1) * 100, 1)
        print(f"[disk] medians: disk {disk_ms:.1f} vs synthetic "
              f"{syn_ms:.1f} ms/step -> loader overhead "
              f"{out['loader_overhead_pct']}%", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
