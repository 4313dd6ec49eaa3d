"""Checkpointing: Orbax save/restore of the full train state + config.

Replaces util/util.py:217-237 (per-network `<epoch>_net_{SR,D,E}.pth` files)
with Orbax checkpoints of the complete TrainState (params, batch stats,
spectral u/v, both optimizer states, PRNG key) plus the experiment config
JSON — crash-safe, multi-host-ready, resumable (base_options.py:196-221
pickled the argparse options next to the weights for the same reason).

Also exports `save_torch_compatible` so weights can round-trip to the
reference's .pth layout for cross-framework comparison.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from deepsee_tpu.config import Experiment
from deepsee_tpu.utils.files import is_main_process


class CheckpointManager:
    """Orbax itself must run on EVERY process (it coordinates its own
    multi-host commit protocol); only the side-writes here — config.json
    and the tag marker files — are process-0-only."""

    def __init__(self, exp: Experiment, max_to_keep: int = 5):
        self.exp = exp
        self.dir = os.path.abspath(
            os.path.join(exp.checkpoints_dir, exp.name, "orbax"))
        os.makedirs(self.dir, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.dir, options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))
        self._config_written = False

    def save(self, step: int, state: Any, tag: Optional[str] = None) -> None:
        # config snapshot next to the weights (base_options.py:196-208).
        # Written on the SAVE path, not in __init__: restore-only consumers
        # (demo, evaluation, int8_accuracy) construct a manager from a
        # CLI-reconstructed config and must not overwrite the trained
        # run's recorded ground truth.
        if not self._config_written and is_main_process():
            cfg_path = os.path.join(self.exp.checkpoints_dir, self.exp.name,
                                    "config.json")
            with open(cfg_path, "w") as f:
                f.write(self.exp.to_json())
            self._config_written = True
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()
        if tag and is_main_process():
            with open(os.path.join(self.dir, f"{tag}.txt"), "w") as f:
                f.write(str(step))

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any,
                step: Optional[int] = None) -> Any:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint in {self.dir}")
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def close(self):
        self.manager.close()


def load_inference_variables(exp: Experiment,
                             checkpoints_dir: Optional[str] = None,
                             verbose: bool = True,
                             with_step: bool = False):
    """Restore generator+encoder variables from a training checkpoint.

    Checkpoints hold the full TrainState, so the restore template comes
    from the TRAIN-mode system; only the inference nets are kept (D/VGG
    dropped).  Shared by demo.py / evaluate.py / export_serving /
    bench_server — one place for the restore semantics."""
    from deepsee_tpu.system import SRSystem, SystemVariables
    from deepsee_tpu.train.state import create_train_state

    train_exp = exp.replace(is_train=True)
    if checkpoints_dir:
        train_exp = train_exp.replace(checkpoints_dir=checkpoints_dir)
    ckpt = CheckpointManager(train_exp)
    state = ckpt.restore(create_train_state(SRSystem(train_exp),
                                            jax.random.PRNGKey(0)))
    if verbose:
        print(f"Loaded checkpoint at step {int(state.step)}")
    variables = SystemVariables(g=state.g_vars, e=state.e_vars,
                                d=None, vgg=None)
    return (variables, int(state.step)) if with_step else variables


def save_torch_compatible(variables: dict, path: str) -> None:
    """Export one network's variables dict to the reference's .pth key
    layout (inverse of utils/torch_import; requires torch).  For a full
    reference-loadable `<epoch>_net_{SR,E,D}.pth` set, use
    torch_import.export_reference_checkpoint instead."""
    import torch

    from deepsee_tpu.utils.torch_import import export_torch_state

    torch.save(export_torch_state(variables), path)
