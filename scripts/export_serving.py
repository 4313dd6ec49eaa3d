#!/usr/bin/env python
"""Export a trained model as self-contained AOT serving artifacts.

  python scripts/export_serving.py --name 8x_independent_256x256 \\
      --checkpoint checkpoints/run1 [--torch_checkpoint ckpts/] \\
      --batch_size 1 --platforms tpu,cpu --out serving/run1/

Writes `end_to_end.jaxexport`, `styled.jaxexport`, and `manifest.json`.
A server needs only jax to run them (see deepsee_tpu/serve.py docstring):

  from deepsee_tpu.serve import load_serving
  fn = load_serving("serving/run1")          # or raw jax.export.deserialize
  fake, style = fn(image_lr, label)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", required=True)
    p.add_argument("--checkpoint", default="",
                   help="checkpoints root dir (as written by train.py)")
    p.add_argument("--torch_checkpoint", default="",
                   help="reference-format <epoch>_net_*.pth dir")
    p.add_argument("--epoch", default="latest",
                   help="epoch tag of --torch_checkpoint files")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--platforms", default="tpu",
                   help="comma-separated lowering targets, e.g. tpu,cpu")
    p.add_argument("--quantize", default="",
                   choices=("", "int8", "int8_nosmooth"),
                   help="int8: W8A8 quantized convs (s8 MXU serving path); "
                        "int8_nosmooth drops SmoothQuant (~4%% faster, "
                        "-1.2 dB, constant-foldable weights)")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import jax

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.serve import export_serving, save_serving
    from deepsee_tpu.system import SRSystem

    exp = get_preset(args.name).replace(is_train=False)
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    if args.torch_checkpoint:
        from deepsee_tpu.utils.torch_import import import_reference_checkpoint

        variables = import_reference_checkpoint(
            system, args.torch_checkpoint, epoch=args.epoch,
            variables=variables)
    elif args.checkpoint:
        from deepsee_tpu.utils.checkpoint import load_inference_variables

        variables = load_inference_variables(
            exp, checkpoints_dir=args.checkpoint)
    else:
        print("WARNING: exporting RANDOM-INIT weights (no --checkpoint)")

    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    blobs = export_serving(exp, variables, args.batch_size, platforms,
                           quantize=args.quantize)
    save_serving(args.out, exp, blobs, args.batch_size, platforms,
                 quantize=args.quantize)
    for name, blob in blobs.items():
        print(f"wrote {args.out}/{name}.jaxexport ({len(blob)/2**20:.1f} MiB)")


if __name__ == "__main__":
    main()
