#!/usr/bin/env python
"""Training entry point (reference: train.py + scripts/train/*.sh).

Examples:
  # 8x independent on CelebAMask-HQ
  python train.py --name 8x_independent_256x256 \\
      --image_dir /data/CelebAMask-HQ/images \\
      --label_dir /data/CelebAMask-HQ/labels

  # 32x guided with the generator trunk sharded over 4 chips
  python train.py --name 32x_guided_512x512 --data_axis 2 --model_axis 4 \\
      --image_dir ... --label_dir ... --identities_file identities_all.csv

  # smoke run without data
  python train.py --name 8x_independent_128x128 --synthetic --max_steps 3
"""

from __future__ import annotations

import argparse
import dataclasses


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--name", default="8x_independent_256x256",
                   help="preset name (options/configurations.py semantics)")
    p.add_argument("--image_dir", default="")
    p.add_argument("--label_dir", default="")
    p.add_argument("--image_dir_val", default="")
    p.add_argument("--label_dir_val", default="")
    p.add_argument("--identities_file", default="")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--niter", type=int, default=None)
    p.add_argument("--niter_decay", type=int, default=None)
    p.add_argument("--data_axis", type=int, default=1)
    p.add_argument("--model_axis", type=int, default=1)
    p.add_argument("--dcn_axis", type=int, default=1,
                   help="data parallelism ACROSS slices (multi-slice pods);"
                        " batch + grad all-reduce cross DCN, model/spatial"
                        " sharding stays on ICI")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (auto-detected "
                        "coordinator on Cloud TPU pods; honors "
                        "JAX_COORDINATOR_ADDRESS etc. elsewhere) — run one "
                        "process per host, batch_size stays GLOBAL")
    p.add_argument("--partition", default="tensor",
                   choices=("tensor", "spatial"),
                   help="how the model axis is used (channel vs H sharding)")
    p.add_argument("--continue_train", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic data (smoke testing)")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--remat", action="store_true",
                   help="gradient checkpointing (the reference's --efficient)")
    p.add_argument("--remat_policy", default="full",
                   choices=("full", "convs"),
                   help="full: recompute whole blocks (min memory); convs: "
                        "save trunk conv outputs, recompute norms/resizes/"
                        "modulation convs")
    p.add_argument("--compute_dtype", default=None,
                   choices=("bfloat16", "float32"))
    p.add_argument("--vgg_weights", default="",
                   help="torchvision vgg19 state dict (.pth/.npz) for the "
                        "perceptual loss (reference loss.py:105-119); "
                        "random features + a loud warning when absent")
    p.add_argument("--inception_weights", default="",
                   help="pt_inception FID weights for the in-training eval")
    p.add_argument("--alexnet_weights", default="",
                   help="torchvision alexnet weights for in-training LPIPS")
    p.add_argument("--evaluate_val_set", action="store_true")
    p.add_argument("--evaluation_freq", type=int, default=None)
    p.add_argument("--num_evaluation_samples", type=int, default=None)
    p.add_argument("--reuse_fake", action="store_true",
                   help="train D on the G-step fake instead of regenerating"
                        " with the updated G (opt-in deviation from the"
                        " reference schedule; ~1.27x step throughput)")
    from deepsee_tpu.utils.compile_cache import add_cache_args
    add_cache_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    if args.multihost:
        # must run before the first backend use in this process
        import jax

        jax.distributed.initialize()
        print(f"multihost: process {jax.process_index()} of "
              f"{jax.process_count()}, {len(jax.devices())} global devices")
    from deepsee_tpu.config import MeshConfig, get_preset
    from deepsee_tpu.train.loop import Trainer
    from deepsee_tpu.utils.compile_cache import apply_cache_args
    apply_cache_args(args)

    exp = get_preset(args.name)
    data = dataclasses.replace(
        exp.data,
        dataset="synthetic" if args.synthetic else exp.data.dataset,
        image_dir=args.image_dir, label_dir=args.label_dir,
        image_dir_val=args.image_dir_val, label_dir_val=args.label_dir_val,
        identities_file=args.identities_file)
    train = exp.train
    for field, value in (("batch_size", args.batch_size), ("lr", args.lr),
                         ("niter", args.niter),
                         ("niter_decay", args.niter_decay),
                         ("evaluation_freq", args.evaluation_freq),
                         ("num_evaluation_samples",
                          args.num_evaluation_samples)):
        if value is not None:
            train = dataclasses.replace(train, **{field: value})
    train = dataclasses.replace(
        train, vgg_weights=args.vgg_weights,
        inception_weights=args.inception_weights,
        alexnet_weights=args.alexnet_weights,
        evaluate_val_set=args.evaluate_val_set or train.evaluate_val_set)
    if args.remat:
        train = dataclasses.replace(train, remat=True)
    train = dataclasses.replace(train, remat_policy=args.remat_policy)
    if args.reuse_fake:
        train = dataclasses.replace(train, reuse_fake=True)
    model = exp.model
    if args.compute_dtype:
        model = dataclasses.replace(model, compute_dtype=args.compute_dtype)

    exp = exp.replace(
        data=data, train=train, model=model,
        checkpoints_dir=args.checkpoints_dir,
        mesh=MeshConfig(args.data_axis, args.model_axis, args.partition,
                        dcn_axis=args.dcn_axis))

    trainer = Trainer(exp, continue_train=args.continue_train)
    trainer.run(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
