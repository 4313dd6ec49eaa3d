"""Data pipeline tests: transforms (PIL-exact), pairing, loader mechanics."""

import os

import numpy as np
import pytest
from PIL import Image

from deepsee_tpu.config import Experiment, get_preset, tiny_test_experiment
from deepsee_tpu.data import (CelebAMaskHQDataset, DataLoader,
                              SyntheticDataset, TransformParams,
                              apply_image_transform, apply_label_transform,
                              create_dataset)
import dataclasses


def _write_fake_celebahq(tmpdir, n=6, size=96):
    img_dir = os.path.join(tmpdir, "images")
    lab_dir = os.path.join(tmpdir, "labels")
    os.makedirs(img_dir), os.makedirs(lab_dir)
    rng = np.random.RandomState(0)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
                        ).save(os.path.join(img_dir, f"{i}.jpg"))
        Image.fromarray(rng.randint(0, 19, (size, size), dtype=np.uint8)
                        ).save(os.path.join(lab_dir, f"{i}.png"))
    return img_dir, lab_dir


def _exp(tmpdir, **data_kw):
    img_dir, lab_dir = _write_fake_celebahq(str(tmpdir))
    exp = tiny_test_experiment()
    data = dataclasses.replace(exp.data, dataset="celebamaskhq",
                               image_dir=img_dir, label_dir=lab_dir, **data_kw)
    return exp.replace(data=data)


def test_image_transform_matches_pil(tmp_path):
    exp = _exp(tmp_path, no_flip=True)
    cfg = exp.model
    img = Image.open(os.path.join(exp.data.image_dir, "0.jpg"))
    params = TransformParams(crop_pos=(0, 0), flip=False)
    got = apply_image_transform(img, exp.data, cfg, params, is_train=True)
    want = np.asarray(img.convert("RGB").resize(
        (cfg.load_size, cfg.load_size), Image.BICUBIC), dtype=np.float32)
    want = (want / 255.0) * 2.0 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (cfg.crop_size, cfg.crop_size, 3)


def test_label_transform_nearest_and_unknown(tmp_path):
    exp = _exp(tmp_path)
    cfg = exp.model
    lab = np.full((64, 64), 255, dtype=np.uint8)
    lab[:32] = 7
    params = TransformParams(crop_pos=(0, 0), flip=False)
    got = apply_label_transform(Image.fromarray(lab), exp.data, cfg, params,
                                is_train=False)
    assert got.dtype == np.int32
    assert set(np.unique(got)) <= {7, cfg.label_nc}  # 255 -> label_nc


def test_dataset_pairing_and_loader(tmp_path):
    exp = _exp(tmp_path)
    ds = create_dataset(exp, phase="train")
    assert isinstance(ds, CelebAMaskHQDataset)
    assert len(ds) == 6
    s = ds[0]
    assert s["image_hr"].shape == (exp.model.crop_size, exp.model.crop_size, 3)
    assert s["label"].shape == (exp.model.crop_size, exp.model.crop_size)

    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                        num_workers=2)
    batches = list(loader)
    assert len(batches) == 1  # 6 // 4
    b = batches[0]
    assert b["image_hr"].shape[0] == 4
    assert b["label"].dtype == np.int32
    assert len(b["path"]) == 4

    # deterministic across epochs given same seed
    l1 = DataLoader(ds, batch_size=2, shuffle=True, seed=7)
    l2 = DataLoader(ds, batch_size=2, shuffle=True, seed=7)
    p1 = [b["path"] for b in l1]
    p2 = [b["path"] for b in l2]
    assert p1 == p2


def test_synthetic_dataset_smoke():
    exp = tiny_test_experiment()
    ds = SyntheticDataset(exp, length=8)
    s = ds[3]
    assert s["image_hr"].min() >= -1 and s["image_hr"].max() <= 1
    assert s["label"].max() < exp.model.label_nc
    # deterministic
    s2 = ds[3]
    np.testing.assert_array_equal(s["image_hr"], s2["image_hr"])


def test_preset_configs():
    e = get_preset("8x_independent_256x256")
    assert e.model.start_size == 32 and e.model.crop_size == 256
    assert e.model.net_e == "combinedstyle"
    assert e.model.add_noise
    g = get_preset("32x_guided_512x512")
    assert g.model.crop_size == 512 and not g.model.add_noise
    assert g.model.net_e == "fullstyle" and g.model.guiding_style_image
    assert g.model.n_blocks == 5


def test_loader_abandonment_stops_decoding_and_threads():
    """Consumers that take a few batches and leave (the in-training
    evaluator) must not leak prefetch/decode threads or keep decoding the
    rest of the epoch in the background."""
    import threading
    import time

    class Counting:
        def __init__(self, n):
            self.n = n
            self.count = 0
            self.lock = threading.Lock()

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            with self.lock:
                self.count += 1
            time.sleep(0.002)
            return {"label": np.zeros((4, 4), np.int32),
                    "image_hr": np.zeros((4, 4, 3), np.float32)}

    ds = Counting(400)
    base_threads = threading.active_count()
    for _ in range(3):
        loader = DataLoader(ds, batch_size=2, shuffle=False,
                            num_workers=2, prefetch=2)
        it = iter(loader)
        next(it)
        next(it)
        it.close()  # abandon mid-epoch
    time.sleep(0.8)
    fetched_after_settle = ds.count
    time.sleep(0.8)
    assert ds.count - fetched_after_settle <= 8, (
        "decoding continued after abandonment")
    assert ds.count < 200, f"ate the epoch in background: {ds.count}"
    assert threading.active_count() <= base_threads + 2, (
        "prefetch threads leaked")


def test_loader_reseed_dataset_flag():
    """reseed_dataset=False (the in-training eval loader) must not touch
    the shared dataset's augmentation seed."""

    class Seeded:
        def __init__(self):
            self.calls = []

        def __len__(self):
            return 4

        def seed(self, s):
            self.calls.append(s)

        def __getitem__(self, i):
            return {"label": np.zeros((2, 2), np.int32)}

    ds = Seeded()
    list(DataLoader(ds, 2, reseed_dataset=False, prefetch=0, num_workers=1))
    assert ds.calls == []
    list(DataLoader(ds, 2, prefetch=0, num_workers=1))
    assert len(ds.calls) == 1
