"""Datasets: file pairing, splits, identity-based guiding-image sampling.

Rebuilt from data/celeba_dataset.py, data/celebamaskhq_dataset.py,
data/base_dataset.py and data/image_folder.py.  Pure host-side Python: each
sample is a dict of numpy arrays; batching/prefetch lives in loader.py and
everything after decode runs on device.

A SyntheticDataset stands in when no CelebA data is on disk (tests, smoke
benchmarks) — same keys, same shapes, deterministic.
"""

from __future__ import annotations

import csv
import os
import random as _random
import re
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from deepsee_tpu.config import DataConfig, Experiment, ModelConfig
from deepsee_tpu.data.transforms import get_params, load_image, load_label

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".tiff", ".webp")


class SkipSampleException(Exception):
    """Raised when a sample cannot be formed (data/custom_exception.py:1);
    loaders skip and continue, like inference_manager.py:99-106."""


def natural_sort_key(s: str):
    # util/util.py:181-186
    return [int(t) if t.isdigit() else t.lower()
            for t in re.split(r"(\d+)", s)]


def list_images(directory: str, read_cache: bool = False,
                write_cache: bool = False) -> List[str]:
    """Recursive image listing with an optional `files.list` cache in the
    directory (reference: data/image_folder.py:36-64,
    --cache_filelist_read/write)."""
    cache = os.path.join(directory, "files.list")
    if read_cache and os.path.exists(cache):
        with open(cache) as f:
            return [line.rstrip("\n") for line in f if line.strip()]
    out = []
    for root, _, files in os.walk(directory):
        for f in files:
            if f.lower().endswith(IMG_EXTENSIONS):
                out.append(os.path.join(root, f))
    out.sort(key=natural_sort_key)
    if write_cache:
        try:
            with open(cache, "w") as f:
                f.write("\n".join(out))
        except OSError:
            pass
    return out


def _stem(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


class PairedImageDataset:
    """Label/image dirs paired by sorted order with a basename sanity check
    (base_dataset.py:42-85)."""

    label_preprocess_mode: Optional[str] = None  # override for labels

    def __init__(self, exp: Experiment, phase: Optional[str] = None):
        self.exp = exp
        self.cfg: ModelConfig = exp.model
        self.data_cfg: DataConfig = exp.data
        self.phase = phase or exp.data.phase
        self.is_train = self.phase == "train"
        self.rng = _random.Random(0)

        dc = self.data_cfg
        label_paths = list_images(dc.label_dir, dc.cache_filelist_read,
                                  dc.cache_filelist_write)
        image_paths = list_images(dc.image_dir, dc.cache_filelist_read,
                                  dc.cache_filelist_write)
        n = self.data_cfg.max_dataset_size
        if n:
            label_paths, image_paths = label_paths[:n], image_paths[:n]
        if not self.data_cfg.no_pairing_check:
            assert len(label_paths) == len(image_paths), (
                f"#labels ({len(label_paths)}) != #images ({len(image_paths)})")
            for lp, ip in zip(label_paths, image_paths):
                assert _stem(lp) == _stem(ip), f"pair mismatch: {lp} vs {ip}"
        self.label_paths = label_paths
        self.image_paths = image_paths

    def __len__(self) -> int:
        return len(self.label_paths)

    def seed(self, seed: int) -> None:
        self.rng = _random.Random(seed)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        label_path = self.label_paths[index]
        image_path = self.image_paths[index]
        # PIL's open is lazy: this parses only the header for the size that
        # seeds get_params (the rng stream must match the PIL-only path)
        with Image.open(label_path) as lab_img:
            label_size = lab_img.size
        params = get_params(self.data_cfg, self.cfg, label_size, self.rng)

        sample = {
            "label": load_label(
                label_path, self.data_cfg, self.cfg, params, self.is_train,
                preprocess_mode=self.label_preprocess_mode),
            "image_hr": load_image(
                image_path, self.data_cfg, self.cfg, params, self.is_train),
            "path": image_path,
        }
        return self.postprocess(sample, params)

    def postprocess(self, sample, params):
        if self.cfg.guiding_style_image:
            gid = self.sample_guiding_id(sample["path"])
            sample["guiding_image_id"] = gid
            gimg = os.path.join(self.data_cfg.image_dir, f"{gid}.jpg")
            glab = os.path.join(self.data_cfg.label_dir, f"{gid}.png")
            sample["guiding_image"] = load_image(
                gimg, self.data_cfg, self.cfg, params, self.is_train)
            sample["guiding_label"] = load_label(
                glab, self.data_cfg, self.cfg, params, self.is_train,
                preprocess_mode=self.label_preprocess_mode)
        return sample

    def sample_guiding_id(self, path: str) -> str:
        raise NotImplementedError


class CelebAMaskHQDataset(PairedImageDataset):
    """CelebAMask-HQ: resize_and_crop; identities from a CSV with columns
    (hq_file_id, identity) (celebamaskhq_dataset.py:17-44)."""

    def __init__(self, exp: Experiment, phase: Optional[str] = None):
        super().__init__(exp, phase)
        self.id2identity: Dict[str, str] = {}
        self.identity2ids: Dict[str, List[str]] = {}
        if self.cfg.guiding_style_image:
            path = self.data_cfg.identities_file
            assert path and os.path.exists(path), (
                f"identities file required for guided model: {path!r}")
            file_ids = {_stem(p) for p in self.image_paths}
            with open(path, newline="") as f:
                for row in csv.DictReader(f):
                    fid, ident = row["hq_file_id"], row["identity"]
                    if fid in file_ids:
                        self.id2identity[fid] = ident
                        self.identity2ids.setdefault(ident, []).append(fid)

    def sample_guiding_id(self, path: str) -> str:
        fid = _stem(path)
        candidates = set(self.identity2ids[self.id2identity[fid]])
        if self.phase != "train":
            candidates.discard(fid)  # never self off-train (:40-42)
            if not candidates:
                raise SkipSampleException(f"no other image of identity "
                                          f"for {fid}")
        return self.rng.sample(sorted(candidates), 1)[0]


class CelebADataset(PairedImageDataset):
    """CelebA: center_crop(178) + resize images; labels use plain 'resize'
    (predicted on square images, celeba_dataset.py:52-55); identities from
    the space-separated identity_CelebA.txt (:19-33)."""

    label_preprocess_mode = "resize"

    def __init__(self, exp: Experiment, phase: Optional[str] = None):
        super().__init__(exp, phase)
        self.id2identity: Dict[str, str] = {}
        self.identity2ids: Dict[str, List[str]] = {}
        if self.cfg.guiding_style_image:
            path = self.data_cfg.identities_file
            assert path and os.path.exists(path), "identities file required"
            with open(path) as f:
                for line in f:
                    filename, ident = line.split()
                    fid = os.path.splitext(filename)[0]
                    self.id2identity[fid] = ident
                    self.identity2ids.setdefault(ident, []).append(fid)

    def sample_guiding_id(self, path: str) -> str:
        fid = _stem(path)
        candidates = set(self.identity2ids[self.id2identity[fid]])
        if self.phase == "test":
            candidates.discard(fid)
            if not candidates:
                raise SkipSampleException(f"no other candidate for {fid}")
        return self.rng.sample(sorted(candidates), 1)[0]


class SyntheticDataset:
    """Deterministic random samples with the real pipeline's keys/shapes.
    Smooth blobby images + blocky label maps so SR/metrics are non-trivial."""

    def __init__(self, exp: Experiment, length: int = 64,
                 phase: Optional[str] = None, seed: int = 0):
        self.cfg = exp.model
        self.length = length
        self.seed = seed
        self.guided = exp.model.guiding_style_image

    def __len__(self) -> int:
        return self.length

    def seed_epoch(self, seed: int) -> None:
        pass

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rng = np.random.RandomState(self.seed * 100003 + index)
        size = cfg.crop_size
        small = max(4, size // 8)

        def smooth(channels):
            base = rng.randn(small, small, channels).astype(np.float32)
            img = np.asarray(Image.fromarray(
                ((base - base.min()) / (np.ptp(base) + 1e-6) * 255
                 ).astype(np.uint8).squeeze() if channels == 1 else
                ((base - base.min()) / (np.ptp(base) + 1e-6) * 255
                 ).astype(np.uint8),
            ).resize((size, size), Image.BICUBIC), dtype=np.float32)
            if img.ndim == 2:
                img = img[..., None]
            return img / 127.5 - 1.0

        image = smooth(3)
        lab_small = rng.randint(0, cfg.label_nc, (small, small)).astype(np.uint8)
        label = np.asarray(Image.fromarray(lab_small).resize(
            (size, size), Image.NEAREST)).astype(np.int32)
        sample = {"label": label, "image_hr": image,
                  "path": f"synthetic_{index}.png"}
        if self.guided:
            sample["guiding_image"] = smooth(3)
            sample["guiding_label"] = label.copy()
        return sample


def create_dataset(exp: Experiment, phase: Optional[str] = None):
    """Dataset factory (data/__init__.py:11-54)."""
    name = exp.data.dataset
    if name == "celeba":
        return CelebADataset(exp, phase)
    if name == "celebamaskhq":
        return CelebAMaskHQDataset(exp, phase)
    if name == "synthetic":
        return SyntheticDataset(exp, phase=phase)
    raise ValueError(f"Unknown dataset {name!r}")
