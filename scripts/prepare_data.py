#!/usr/bin/env python
"""Dataset preparation: splits + identity files.

Rebuilt from the reference's prep scripts:
  * celebamaskhq-partition  (data/celebamaskhq_partition.py): split
    CelebAMask-HQ by the original CelebA index ranges
    (train < 162771 <= val < 182638 <= test), via symlinks
  * celeba-partition        (data/celeba_partition.py): symlink CelebA
    images into train/val/test per list_eval_partition.txt
  * celebamaskhq-identities (data/celebamaskhq_compute_identities_file.py):
    build the (hq_file_id, celeba_file_id, identity, count) CSV the guided
    model needs for same-identity guiding-image sampling

Usage:
  python scripts/prepare_data.py celebamaskhq-partition \\
      --root /data/CelebAMask-HQ --out /data/CelebAMask-HQ/splits
  python scripts/prepare_data.py celeba-partition \\
      --images /data/CelebA/imgs --partitions list_eval_partition.txt \\
      --out /data/CelebA/images
  python scripts/prepare_data.py celebamaskhq-identities \\
      --mapping CelebA-HQ-to-CelebA-mapping.txt \\
      --identities identity_CelebA.txt --out identities_all.csv
"""

from __future__ import annotations

import argparse
import csv
import os
import pathlib


def celebamaskhq_partition(root: str, out: str, link: bool = True):
    import pandas as pd

    mapping = pd.read_csv(os.path.join(root, "CelebA-HQ-to-CelebA-mapping.txt"),
                          sep=r"\s+", header=0)
    img_in = os.path.join(root, "CelebA-HQ-img")
    dirs = {s: os.path.join(out, f"{s}_img") for s in ("train", "val", "test")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    def split_of(orig_idx: int) -> str:
        if 162771 <= orig_idx < 182638:
            return "val"
        if orig_idx >= 182638:
            return "test"
        return "train"

    n = 0
    for idx, orig in zip(mapping["idx"], mapping["orig_idx"]):
        src = os.path.join(img_in, f"{idx}.jpg")
        dst = os.path.join(dirs[split_of(int(orig))], f"{idx}.jpg")
        if link:
            if not os.path.exists(dst):
                os.symlink(os.path.abspath(src), dst)
        else:
            import shutil
            shutil.copyfile(src, dst)
        n += 1
    print(f"Partitioned {n} images into {out}")


def celeba_partition(partitions: str, images: str, out: str):
    splits = {"0": "train", "1": "val", "2": "test"}
    for s in splits.values():
        pathlib.Path(os.path.join(out, s)).mkdir(parents=True, exist_ok=True)
    n = 0
    with open(partitions) as f:
        for line in f:
            filename, split = line.split()
            dst = os.path.join(out, splits[split], filename)
            if not os.path.exists(dst):
                os.symlink(os.path.join(os.path.abspath(images), filename), dst)
            n += 1
    print(f"Linked {n} files into {out}")


def celebamaskhq_identities(mapping: str, identities: str, out: str):
    import pandas as pd

    hq2celeba = {}
    with open(mapping) as f:
        header = f.readline().split()
        for line in f:
            parts = line.split()
            # columns: idx orig_idx orig_file
            hq2celeba[parts[0]] = os.path.splitext(parts[2])[0]
    celeba_ident = {}
    with open(identities) as f:
        for line in f:
            filename, ident = line.split()
            celeba_ident[os.path.splitext(filename)[0]] = ident

    rows = []
    counts: dict = {}
    for hq_id, celeba_id in hq2celeba.items():
        ident = celeba_ident[celeba_id]
        counts[ident] = counts.get(ident, 0) + 1
    for hq_id, celeba_id in hq2celeba.items():
        ident = celeba_ident[celeba_id]
        rows.append({"hq_file_id": hq_id, "celeba_file_id": celeba_id,
                     "identity": ident, "count": counts[ident]})
    df = pd.DataFrame(rows, columns=["hq_file_id", "celeba_file_id",
                                     "identity", "count"])
    df.to_csv(out, quoting=csv.QUOTE_ALL)
    multi = len(df[df["count"] > 1])
    print(f"Wrote {out}; {multi} entries with more than a single count.")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("celebamaskhq-partition")
    a.add_argument("--root", required=True)
    a.add_argument("--out", required=True)
    a.add_argument("--copy", action="store_true")

    b = sub.add_parser("celeba-partition")
    b.add_argument("--partitions", required=True)
    b.add_argument("--images", required=True)
    b.add_argument("--out", required=True)

    c = sub.add_parser("celebamaskhq-identities")
    c.add_argument("--mapping", required=True)
    c.add_argument("--identities", required=True)
    c.add_argument("--out", required=True)

    args = p.parse_args()
    if args.cmd == "celebamaskhq-partition":
        celebamaskhq_partition(args.root, args.out, link=not args.copy)
    elif args.cmd == "celeba-partition":
        celeba_partition(args.partitions, args.images, args.out)
    else:
        celebamaskhq_identities(args.mapping, args.identities, args.out)


if __name__ == "__main__":
    main()
