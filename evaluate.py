#!/usr/bin/env python
"""Dataset evaluation entry point: run the full metric harness
(PSNR/SSIM/MS-SSIM/RMSE/LPIPS/FID) over a dataset split with a trained
checkpoint — the standalone counterpart of the reference's
InferenceManager.run (managers/inference_manager.py:61-147).

  python evaluate.py --name 8x_independent_256x256 \\
      --image_dir .../test_img --label_dir .../test_label \\
      --checkpoints_dir ./checkpoints --num_samples 1000 \\
      --out results/eval [--save_images]
"""

from __future__ import annotations

import argparse
import dataclasses
import json


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--name", default="8x_independent_256x256")
    p.add_argument("--image_dir", default="")
    p.add_argument("--label_dir", default="")
    p.add_argument("--identities_file", default="")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_samples", type=int, default=1000)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--no_fid", action="store_true")
    p.add_argument("--no_lpips", action="store_true")
    p.add_argument("--no_checkpoint", action="store_true",
                   help="evaluate random-init weights (smoke)")
    p.add_argument("--torch_checkpoint", default="",
                   help="directory holding reference-format "
                        "<epoch>_net_{SR,E}.pth released checkpoints")
    p.add_argument("--epoch", default="latest")
    p.add_argument("--inception_weights", default="")
    p.add_argument("--alexnet_weights", default="")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 quantized inference: evaluate the quantized "
                        "serving path's metrics (quality-delta measurement)")
    p.add_argument("--out", default="")
    p.add_argument("--save_images", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize(); each host evaluates "
                        "its loader stripe, metrics are all-gathered")
    from deepsee_tpu.utils.compile_cache import (add_cache_args,
                                                 apply_cache_args)
    add_cache_args(p)
    args = p.parse_args()
    if args.multihost:
        import jax as _jax

        _jax.distributed.initialize()
    apply_cache_args(args)

    import jax

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.data import DataLoader, create_dataset
    from deepsee_tpu.eval.evaluator import InferenceEvaluator
    from deepsee_tpu.system import SRSystem

    exp = get_preset(args.name).replace(is_train=False,
                                        checkpoints_dir=args.checkpoints_dir)
    exp = exp.replace(
        data=dataclasses.replace(
            exp.data, dataset="synthetic" if args.synthetic else exp.data.dataset,
            image_dir=args.image_dir, label_dir=args.label_dir,
            identities_file=args.identities_file, phase="test"),
        train=dataclasses.replace(exp.train, batch_size=args.batch_size))

    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    if args.torch_checkpoint:
        from deepsee_tpu.utils.torch_import import import_reference_checkpoint

        variables = import_reference_checkpoint(
            system, args.torch_checkpoint, epoch=args.epoch,
            variables=variables)
    elif not args.no_checkpoint:
        from deepsee_tpu.utils.checkpoint import load_inference_variables

        variables = load_inference_variables(exp)

    dataset = create_dataset(exp, phase="test")
    # per-host stripes under --multihost: the evaluator caps each host at
    # num_samples/process_count and all-gathers, so the loader must hand
    # each host DISJOINT samples or the merged set is nproc duplicates
    loader = DataLoader(dataset, args.batch_size, shuffle=False,
                        drop_last=True,
                        shard_index=jax.process_index(),
                        num_shards=jax.process_count())

    ev = InferenceEvaluator(
        system, num_samples=args.num_samples,
        write_details=bool(args.out), folder_out=args.out or None,
        compute_fid=not args.no_fid, compute_lpips=not args.no_lpips,
        inception_weights=args.inception_weights or None,
        alexnet_weights=args.alexnet_weights or None)
    import contextlib

    ctx = contextlib.nullcontext()
    if args.int8:
        from deepsee_tpu.models.layers import int8_inference
        ctx = int8_inference()
    with ctx:  # generation is traced on the first batch, inside the context
        result = ev.run(variables, loader)
    print(json.dumps(result, indent=2, sort_keys=True))

    from deepsee_tpu.utils.files import is_main_process

    if args.save_images and args.out and is_main_process():
        import numpy as np
        from deepsee_tpu.utils.visualizer import save_images_only

        for batch in loader:
            fake, real = ev.run_batch(variables, batch)
            visuals = {"fake_image": np.asarray(jax.device_get(fake)),
                       "image_hr": np.asarray(jax.device_get(real)),
                       "input_label": np.asarray(batch["label"])}
            save_images_only(visuals, batch["path"], f"{args.out}/visuals",
                             exp.model.label_nc)
            break
    return result


if __name__ == "__main__":
    main()
