#!/usr/bin/env python
"""Export a deepsee_tpu training checkpoint to the reference's torch format.

  python scripts/export_torch.py --name 8x_independent_256x256 \\
      --checkpoint checkpoints/run1 --out exported/ [--epoch 50] [--include_d]

Writes `<epoch>_net_{SR,E[,D]}.pth` in the reference's exact save_network
layout (util/util.py:217-237): models trained here load directly into the
reference's torch stack via its own load_network, and back into this
framework via `demo.py --torch_checkpoint exported/`.  Dead reference
params (SEAN style_conv, per-trunk encoder heads) and BN bookkeeping
buffers are synthesized so the reference's strict load_state_dict passes
(see utils/torch_import.complete_for_reference).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="checkpoints root dir (as written by train.py)")
    p.add_argument("--out", required=True)
    p.add_argument("--epoch", default="latest",
                   help="epoch tag for the output filenames")
    p.add_argument("--include_d", action="store_true",
                   help="also export the discriminator (training handoff)")
    args = p.parse_args()

    import jax

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.system import SRSystem, SystemVariables
    from deepsee_tpu.train.state import create_train_state
    from deepsee_tpu.utils.checkpoint import CheckpointManager
    from deepsee_tpu.utils.torch_import import export_reference_checkpoint

    jax.config.update("jax_platforms", "cpu")  # weight surgery only

    # checkpoints hold the full TrainState; restore with the train-mode
    # template (same semantics as utils/checkpoint.load_inference_variables,
    # but keeping D when asked)
    exp = get_preset(args.name).replace(is_train=True,
                                        checkpoints_dir=args.checkpoint)
    state = CheckpointManager(exp).restore(
        create_train_state(SRSystem(exp), jax.random.PRNGKey(0)))
    print(f"Loaded checkpoint at step {int(state.step)}")
    variables = SystemVariables(
        g=state.g_vars, e=state.e_vars,
        d=state.d_vars if args.include_d else None, vgg=None)

    written = export_reference_checkpoint(variables, args.out,
                                          epoch=args.epoch)
    for tag, path in written.items():
        print(f"net_{tag}: {path}")


if __name__ == "__main__":
    main()
