"""scripts/prepare_data.py: split + identities-file builders."""

import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import prepare_data  # noqa: E402


def test_celebamaskhq_partition(tmp_path):
    root = tmp_path / "hq"
    (root / "CelebA-HQ-img").mkdir(parents=True)
    rng = np.random.RandomState(0)
    rows = ["idx orig_idx orig_file"]
    # idx 0 -> train (orig 10), idx 1 -> val (orig 170000), idx 2 -> test
    for idx, orig in ((0, 10), (1, 170000), (2, 190000)):
        Image.fromarray(rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)).save(
            root / "CelebA-HQ-img" / f"{idx}.jpg")
        rows.append(f"{idx} {orig} {orig}.jpg")
    (root / "CelebA-HQ-to-CelebA-mapping.txt").write_text("\n".join(rows))

    out = tmp_path / "splits"
    prepare_data.celebamaskhq_partition(str(root), str(out))
    assert os.path.exists(out / "train_img" / "0.jpg")
    assert os.path.exists(out / "val_img" / "1.jpg")
    assert os.path.exists(out / "test_img" / "2.jpg")


def test_celeba_partition(tmp_path):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for i in range(3):
        (imgs / f"{i:06d}.jpg").write_bytes(b"x")
    part = tmp_path / "list_eval_partition.txt"
    part.write_text("000000.jpg 0\n000001.jpg 1\n000002.jpg 2\n")
    out = tmp_path / "out"
    prepare_data.celeba_partition(str(part), str(imgs), str(out))
    assert os.path.lexists(out / "train" / "000000.jpg")
    assert os.path.lexists(out / "val" / "000001.jpg")
    assert os.path.lexists(out / "test" / "000002.jpg")


def test_celebamaskhq_identities(tmp_path):
    mapping = tmp_path / "mapping.txt"
    mapping.write_text("idx orig_idx orig_file\n"
                       "0 10 000010.jpg\n"
                       "1 11 000011.jpg\n"
                       "2 12 000012.jpg\n")
    identities = tmp_path / "identity_CelebA.txt"
    identities.write_text("000010.jpg 7\n000011.jpg 7\n000012.jpg 9\n")
    out = tmp_path / "identities_all.csv"
    prepare_data.celebamaskhq_identities(str(mapping), str(identities),
                                         str(out))

    # loadable by the dataset class format (csv with hq_file_id/identity)
    import csv

    with open(out, newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    by_id = {r["hq_file_id"]: r for r in rows}
    assert by_id["0"]["identity"] == "7" and by_id["0"]["count"] == "2"
    assert by_id["2"]["identity"] == "9" and by_id["2"]["count"] == "1"
