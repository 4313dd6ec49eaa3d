"""Training observability: loss log, HTML image dashboard, image dumps.

Mirrors util/visualizer.py + util/ownhtml.py: a self-refreshing HTML page of
per-epoch image grids under checkpoints/<name>/web/ (:33-116), plain-text
loss lines with steps/sec in loss_log.txt (:119-133), and per-key image
folders with a combined side-by-side strip (save_images_only, :181-215).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Sequence

import numpy as np

from deepsee_tpu.config import Experiment
from deepsee_tpu.utils.files import is_main_process
from deepsee_tpu.utils.images import label2im, save_image, tensor2im

_HTML_HEADER = """<!DOCTYPE html><html><head>
<meta http-equiv="refresh" content="30">
<title>{title}</title>
<style>table{{border-collapse:collapse}} td{{padding:4px;text-align:center;
font-family:monospace}} img{{max-width:256px}}</style></head><body>
<h1>{title}</h1>
"""


class Visualizer:
    def __init__(self, exp: Experiment):
        self.exp = exp
        # multi-host: only process 0 writes the run directory (the
        # reference is single-host and writes unconditionally)
        self.active = is_main_process()
        self.run_dir = os.path.join(exp.checkpoints_dir, exp.name)
        self.web_dir = os.path.join(self.run_dir, "web")
        self.img_dir = os.path.join(self.web_dir, "images")
        self.log_path = os.path.join(self.run_dir, "loss_log.txt")
        if self.active:
            os.makedirs(self.img_dir, exist_ok=True)
            with open(self.log_path, "a") as f:
                f.write(f"=============== Training Loss "
                        f"({time.strftime('%c')}) ===============\n")
        self.rows: List[Dict] = []

    def _to_uint8(self, key: str, value: np.ndarray) -> np.ndarray:
        value = np.asarray(value)
        if "label" in key or "semantics" in key:
            return label2im(value, self.exp.model.label_nc)
        return tensor2im(value)

    def display_current_results(self, visuals: Dict[str, np.ndarray],
                                epoch: int, step: int) -> None:
        """visuals: dict of (H,W,C) arrays in [-1,1] (or label maps)."""
        if not self.active:
            return
        files = {}
        for key, value in visuals.items():
            fname = f"epoch{epoch:03d}_step{step}_{key}.png"
            save_image(self._to_uint8(key, value),
                       os.path.join(self.img_dir, fname))
            files[key] = fname
        self.rows.insert(0, {"epoch": epoch, "step": step, "files": files})
        self._write_html()

    def _write_html(self) -> None:
        path = os.path.join(self.web_dir, "index.html")
        with open(path, "w") as f:
            f.write(_HTML_HEADER.format(title=f"Experiment {self.exp.name}"))
            for row in self.rows[:50]:
                f.write(f"<h3>epoch {row['epoch']} step {row['step']}</h3>"
                        f"<table><tr>")
                for key, fname in row["files"].items():
                    f.write(f"<td><img src='images/{fname}'><br>{key}</td>")
                f.write("</tr></table>\n")
            f.write("</body></html>\n")

    def print_current_errors(self, epoch: int, i: int,
                             errors: Dict[str, float],
                             time_per_sample: float) -> None:
        if not self.active:
            return
        message = (f"(epoch: {epoch}, iters: {i}, "
                   f"samples/sec: {1.0 / max(time_per_sample, 1e-9):.3f}) ")
        for k, v in errors.items():
            message += f"{k}: {float(v):.3f} "
        print(message)
        with open(self.log_path, "a") as f:
            f.write(message + "\n")


def save_images_only(visuals: Dict[str, np.ndarray], paths: Sequence[str],
                     folder_out: str, label_nc: int = 19) -> None:
    """Per-key folders + combined side-by-side strip
    (util/visualizer.py:181-215)."""
    os.makedirs(folder_out, exist_ok=True)
    batch = None
    combined = {}
    for key, value in visuals.items():
        value = np.asarray(value)
        if value.ndim < 4 and not ("label" in key or "semantics" in key):
            continue
        arrs = []
        for b in range(value.shape[0]):
            if "label" in key or "semantics" in key:
                arr = label2im(value[b], label_nc)
            else:
                arr = tensor2im(value[b])
            name = os.path.splitext(os.path.basename(paths[b]))[0]
            save_image(arr, os.path.join(folder_out, key, f"{name}.png"),
                       create_dir=True)
            arrs.append(arr)
        combined[key] = arrs
        batch = len(arrs)
    if batch:
        for b in range(batch):
            h = max(a[b].shape[0] for a in combined.values())
            strips = []
            for key in combined:
                a = combined[key][b]
                if a.shape[0] != h:  # upscale smaller (e.g. LR) inputs
                    from PIL import Image
                    a = np.asarray(Image.fromarray(a).resize(
                        (h * a.shape[1] // a.shape[0], h), Image.NEAREST))
                strips.append(a)
            strip = np.concatenate(strips, axis=1)
            name = os.path.splitext(os.path.basename(paths[b]))[0]
            save_image(strip, os.path.join(folder_out, "combined",
                                           f"{name}.png"), create_dir=True)
