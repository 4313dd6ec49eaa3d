"""evaluate_folder.py CLI end-to-end on temp folders."""

import os
import sys

import numpy as np
from PIL import Image


def test_evaluate_folder_cli(tmp_path, monkeypatch, capsys):
    fake_dir = tmp_path / "fake"
    real_dir = tmp_path / "real"
    out_dir = tmp_path / "out"
    fake_dir.mkdir(), real_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        real = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        noise = rng.randint(-20, 20, real.shape)
        fake = np.clip(real.astype(int) + noise, 0, 255).astype(np.uint8)
        Image.fromarray(real).save(real_dir / f"{i}.png")
        Image.fromarray(fake).save(fake_dir / f"{i}.png")

    import evaluate_folder

    monkeypatch.setattr(sys, "argv", [
        "evaluate_folder.py", "--fake_dir", str(fake_dir),
        "--real_dir", str(real_dir), "--crop_size", "64",
        "--batch_size", "2", "--no_fid", "--no_lpips",
        "--out", str(out_dir)])
    result = evaluate_folder.main()

    assert result["n_samples"] == 4
    assert 15 < result["psnr/mean"] < 40   # ~20dB for +/-20 noise
    assert 0 < result["ssim/mean"] <= 1
    assert os.path.exists(out_dir / "metrics.csv")
    with open(out_dir / "metrics.csv") as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 5  # header + 4 samples
