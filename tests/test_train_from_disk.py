"""Trainer driven by an ON-DISK dataset — the reference's only operating
mode (train.py:23-44 -> data/__init__.py:41 -> CelebA(MaskHQ)Dataset ->
base_dataset.py:87-107 PIL decode+transform per sample).

Every other Trainer.run in the suite feeds SyntheticDataset; these tests
lock the full composition Trainer.run -> make_dataloader -> create_dataset
-> file pairing -> (guided: identity-sampled SECOND decode per sample) ->
prefetching loader -> jitted GAN step, end to end from a real file tree,
for both model families and both dataset classes.
"""

import pytest
import csv
import dataclasses
import os

import jax
import numpy as np
from PIL import Image

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.data import create_dataset
from deepsee_tpu.train.loop import Trainer


def _write_celeba_corpus(tmpdir, n=6):
    """CelebA-format tree: 178x218 JPGs + same-stem PNG labels + the
    space-separated identity_CelebA.txt (celeba_dataset.py:19-33)."""
    img_dir = os.path.join(tmpdir, "img")
    lab_dir = os.path.join(tmpdir, "lab")
    os.makedirs(img_dir), os.makedirs(lab_dir)
    rng = np.random.RandomState(0)
    ident_path = os.path.join(tmpdir, "identity_CelebA.txt")
    with open(ident_path, "w") as f:
        for i in range(n):
            stem = f"{i:06d}"
            Image.fromarray(
                rng.randint(0, 255, (218, 178, 3), dtype=np.uint8)
            ).save(os.path.join(img_dir, stem + ".jpg"), quality=92)
            lab = rng.randint(0, 19, (218, 178), dtype=np.uint8)
            lab[0, 0] = 255  # unknown label -> label_nc remap path
            Image.fromarray(lab).save(os.path.join(lab_dir, stem + ".png"))
            f.write(f"{stem}.jpg {i % 3}\n")  # 3 identities, 2 images each
    return img_dir, lab_dir, ident_path


def _write_hq_corpus(tmpdir, n=6, size=96):
    """CelebAMask-HQ-format tree: square JPGs + labels + identities CSV
    with (hq_file_id, identity) columns (celebamaskhq_dataset.py:17-27)."""
    img_dir = os.path.join(tmpdir, "img")
    lab_dir = os.path.join(tmpdir, "lab")
    os.makedirs(img_dir), os.makedirs(lab_dir)
    rng = np.random.RandomState(1)
    ident_path = os.path.join(tmpdir, "identities_all.csv")
    with open(ident_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["hq_file_id", "identity"])
        w.writeheader()
        for i in range(n):
            Image.fromarray(
                rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
            ).save(os.path.join(img_dir, f"{i}.jpg"), quality=92)
            Image.fromarray(
                rng.randint(0, 19, (size, size), dtype=np.uint8)
            ).save(os.path.join(lab_dir, f"{i}.png"))
            w.writerow({"hq_file_id": str(i), "identity": str(i % 3)})
    return img_dir, lab_dir, ident_path


def _quiet_train(exp):
    return exp.replace(train=dataclasses.replace(
        exp.train, niter=1, niter_decay=0, print_freq=10**9,
        save_latest_freq=10**9, display_freq=10**9, evaluation_freq=10**9))


def test_train_from_disk_independent_celeba(tmp_path):
    img_dir, lab_dir, _ = _write_celeba_corpus(str(tmp_path))
    exp = tiny_test_experiment(name="disk_independent",
                               checkpoints_dir=str(tmp_path / "ck"))
    exp = _quiet_train(exp.replace(data=dataclasses.replace(
        exp.data, dataset="celeba",
        preprocess_mode="center_crop_and_resize", center_crop_size=178,
        image_dir=img_dir, label_dir=lab_dir)))

    trainer = Trainer(exp)
    state = trainer.run(max_steps=2)  # dataloader=None -> make_dataloader
    assert int(state.step) == 2
    # crash-save finally wrote the 'latest' checkpoint from the disk-fed run
    assert trainer.ckpt.latest_step() == 2
    for leaf in jax.tree_util.tree_leaves(state.g_vars):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_train_from_disk_guided_hq(tmp_path):
    img_dir, lab_dir, ident = _write_hq_corpus(str(tmp_path))
    exp = tiny_test_experiment(name="disk_guided",
                               checkpoints_dir=str(tmp_path / "ck"))
    exp = exp.replace(model=dataclasses.replace(
        exp.model, net_e="fullstyle", guiding_style_image=True))
    exp = _quiet_train(exp.replace(data=dataclasses.replace(
        exp.data, dataset="celebamaskhq", image_dir=img_dir,
        label_dir=lab_dir, identities_file=ident)))

    # the guided dataset really performs the second (guiding) decode
    ds = create_dataset(exp, phase="train")
    sample = ds[0]
    assert sample["guiding_image"].shape == sample["image_hr"].shape
    assert sample["guiding_label"].shape == sample["label"].shape
    assert sample["guiding_image_id"] in {str(i) for i in range(6)}

    trainer = Trainer(exp)
    state = trainer.run(max_steps=2)
    assert int(state.step) == 2
    assert trainer.ckpt.latest_step() == 2
