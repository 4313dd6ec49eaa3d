#!/usr/bin/env python
"""Demo entry point (reference: demo.py + managers/demo_manager.py).

Upscales one LR face given an HR semantic mask and a style source:

  python demo.py --name 8x_independent_256x256 \\
      --image_lr face_32.png --semantics mask_256.png \\
      [--style_csv style.csv | --hr_image face.jpg:11,12 ...] \\
      [--checkpoint <orbax dir or .pth prefix>] --out results/

Style sources (demo.py:97-118):
  * --style_csv: a saved (19, S) style matrix
  * --hr_image path[:r1,r2,...]: encode HR image(s); the first provides the
    base style, later ones overwrite the listed region rows
    (demo_manager.py:21-27)
  * neither: encode from the LR input (independent model only)

Outputs the upscaled PNG plus the applied style matrix as CSV
(demo.py:62-73).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp


class Demo:
    def __init__(self, exp, variables=None):
        from deepsee_tpu.system import SRSystem

        self.exp = exp
        self.system = SRSystem(exp.replace(is_train=False))
        self.variables = variables or self.system.init(jax.random.PRNGKey(0))

    # -- IO -------------------------------------------------------------

    def load_image(self, path: str, size: Optional[int] = None) -> jnp.ndarray:
        from deepsee_tpu.utils.images import image_file_to_array

        return jnp.asarray(image_file_to_array(path, size))

    def load_label(self, path: str) -> jnp.ndarray:
        from deepsee_tpu.utils.images import label_file_to_array

        cfg = self.exp.model
        return jnp.asarray(label_file_to_array(
            path, cfg.crop_size, cfg.label_nc))

    # -- style sources ----------------------------------------------------

    def compute_style_from_hr(self, inputs_hr: List[Dict]) -> jnp.ndarray:
        """inputs_hr: [{'image_hr': (1,H,W,3), 'label': (1,H,W),
        'regions': [int] or 'all'}]; first = base style, later entries
        overwrite their listed region rows (demo_manager.py:12-29)."""
        from deepsee_tpu.inference.modes import encode_only

        styles = []
        for inp in inputs_hr:
            batch = self.system.preprocess(
                {"image_hr": inp["image_hr"], "label": inp["label"]})
            styles.append(encode_only(self.system, self.variables, batch,
                                      encode_full=True))
        style = styles[0]
        for i in range(1, len(inputs_hr)):
            regions = inputs_hr[i]["regions"]
            if regions == "all":
                regions = range(style.shape[1])
            for r in regions:
                style = style.at[:, r].set(styles[i][:, r])
        return style

    def compute_style_from_lr(self, image_lr, label) -> jnp.ndarray:
        assert self.exp.model.net_e == "combinedstyle", (
            "Only the independent model can compute the style from a LR "
            "image (demo.py:115)")
        from deepsee_tpu.inference.modes import encode_only

        cfg = self.exp.model
        batch = self.system.preprocess({
            "image_lr": image_lr, "label": label,
            "image_hr": jnp.zeros((1, cfg.crop_size, cfg.crop_size, 3))})
        return encode_only(self.system, self.variables, batch,
                           encode_full=False)

    # -- main -------------------------------------------------------------

    def run(self, path_image_lr: str, path_semantics: str,
            path_encoded_style: str = "",
            encoded_style: Optional[jnp.ndarray] = None,
            inputs_hr: Sequence[Dict] = (),
            out_dir: str = "./results") -> Dict:
        from deepsee_tpu.inference.modes import generate_with_style
        from deepsee_tpu.utils.images import (load_style_matrix, save_image,
                                              save_style_matrix, tensor2im)

        cfg = self.exp.model
        image_lr = self.load_image(path_image_lr, cfg.start_size)
        label = self.load_label(path_semantics)

        if path_encoded_style:
            encoded_style = jnp.asarray(
                load_style_matrix(path_encoded_style))[None]
        elif encoded_style is not None:
            encoded_style = jnp.asarray(encoded_style)
            if encoded_style.ndim == 2:
                encoded_style = encoded_style[None]
        elif inputs_hr:
            loaded = [{
                "image_hr": self.load_image(h["path_image_hr"], cfg.crop_size),
                "label": self.load_label(h["path_semantics"]),
                "regions": h.get("regions", "all"),
            } for h in inputs_hr]
            encoded_style = self.compute_style_from_hr(loaded)
        else:
            encoded_style = self.compute_style_from_lr(image_lr, label)

        batch = self.system.preprocess(
            {"image_lr": image_lr, "label": label})
        fake = generate_with_style(self.system, self.variables, batch,
                                   encoded_style)

        os.makedirs(out_dir, exist_ok=True)
        stem = os.path.splitext(os.path.basename(path_image_lr))[0]
        png_path = os.path.join(out_dir, f"demo_{stem}.png")
        save_image(tensor2im(np.asarray(fake[0])), png_path)
        save_style_matrix(np.asarray(encoded_style[0]),
                          png_path[:-4] + ".csv")
        print(f"Saved {png_path}")
        return {"fake_image": fake, "encoded_style": encoded_style,
                "save_path": png_path}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--name", default="8x_independent_256x256")
    p.add_argument("--image_lr", required=True)
    p.add_argument("--semantics", required=True)
    p.add_argument("--style_csv", default="")
    p.add_argument("--hr_image", action="append", default=[],
                   help="path[:r1,r2,...] — HR style image with region list")
    p.add_argument("--checkpoint", default="",
                   help="orbax checkpoint dir (from training) to load")
    p.add_argument("--torch_checkpoint", default="",
                   help="directory holding reference-format "
                        "<epoch>_net_{SR,E}.pth released checkpoints")
    p.add_argument("--epoch", default="latest",
                   help="epoch tag of --torch_checkpoint files")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 quantized inference (s8 MXU serving path)")
    p.add_argument("--out", default="./results")
    from deepsee_tpu.utils.compile_cache import (add_cache_args,
                                                 apply_cache_args)
    add_cache_args(p)
    args = p.parse_args()
    apply_cache_args(args)

    from deepsee_tpu.config import get_preset

    exp = get_preset(args.name).replace(is_train=False)
    demo = Demo(exp)
    if args.torch_checkpoint:
        from deepsee_tpu.utils.torch_import import import_reference_checkpoint

        demo.variables = import_reference_checkpoint(
            demo.system, args.torch_checkpoint, epoch=args.epoch)
    elif args.checkpoint:
        from deepsee_tpu.utils.checkpoint import load_inference_variables

        demo.variables = load_inference_variables(
            exp, checkpoints_dir=args.checkpoint)

    inputs_hr = []
    for spec in args.hr_image:
        if ":" in spec:
            path, regions = spec.rsplit(":", 1)
            regions = [int(r) for r in regions.split(",")]
        else:
            path, regions = spec, "all"
        inputs_hr.append({"path_image_hr": path,
                          "path_semantics": args.semantics,
                          "regions": regions})

    import contextlib

    ctx = contextlib.nullcontext()
    if args.int8:
        from deepsee_tpu.models.layers import int8_inference
        ctx = int8_inference()
    with ctx:  # the trace happens on this first (only) call
        demo.run(args.image_lr, args.semantics,
                 path_encoded_style=args.style_csv, inputs_hr=inputs_hr,
                 out_dir=args.out)


if __name__ == "__main__":
    main()
