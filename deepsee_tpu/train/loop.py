"""The training driver (reference: train.py:18-127).

Epoch/iteration loop over the fused jitted GAN step with:
  * G step every `d_steps_per_g`-th iteration, D step every iteration
    (train.py:40-44)
  * per-epoch TTUR learning-rate decay (trainer_manager.py:76-96)
  * periodic print / display / save / evaluation hooks driven by
    IterationCounter's modular triggers (train.py:49-105)
  * crash-safe checkpointing in a finally block (train.py:119-127)
  * optional device mesh: batch sharded over "data", generator trunk over
    "model" (replaces DataParallel + model_parallel_mode)
"""

from __future__ import annotations

import traceback
from typing import Dict, Optional

import jax
import numpy as np

from deepsee_tpu.config import Experiment
from deepsee_tpu.data import DataLoader, create_dataset
from deepsee_tpu.eval.evaluator import InferenceEvaluator, evaluate_set
from deepsee_tpu.parallel import make_mesh, shard_batch, shard_train_state
from deepsee_tpu.system import SRSystem, SystemVariables
from deepsee_tpu.train.state import (TrainState, create_train_state,
                                     set_epoch_lr)
from deepsee_tpu.train.steps import make_train_step
from deepsee_tpu.utils.checkpoint import CheckpointManager
from deepsee_tpu.utils.iter_counter import IterationCounter
from deepsee_tpu.utils.visualizer import Visualizer


@jax.jit
def _first_row(x):
    """Batch row 0 (as a 1-row array), jitted so it is legal on
    non-fully-addressable global arrays (jax_spmd_mode='allow_jit')."""
    return x[:1]


class Trainer:
    def __init__(self, exp: Experiment, continue_train: bool = False):
        assert exp.is_train
        self.exp = exp
        self.continue_train = continue_train
        self.system = SRSystem(exp)

        self.mesh = None
        if jax.process_count() > 1:
            # multi-process demands a mesh spanning ALL global devices:
            # a smaller mesh leaves some hosts with zero addressable
            # shards and dies in an opaque placement error at batch 1
            if exp.mesh.n_devices != len(jax.devices()):
                raise ValueError(
                    "multi-process run needs a mesh covering all global "
                    f"devices: mesh n_devices={exp.mesh.n_devices} but "
                    f"{len(jax.devices())} devices across "
                    f"{jax.process_count()} processes")
        if exp.mesh.n_devices > 1:
            self.mesh = make_mesh(exp.mesh)

        self.state = create_train_state(
            self.system, jax.random.PRNGKey(exp.train.seed))
        self.ckpt = CheckpointManager(exp)
        try:  # source snapshot per run (util/files.py copy_src)
            from deepsee_tpu.utils.files import copy_src, is_main_process
            if is_main_process():
                copy_src(f"{exp.checkpoints_dir}/{exp.name}")
        except Exception as e:  # noqa: BLE001
            print(f"copy_src failed: {e}")
        if continue_train and self.ckpt.latest_step() is not None:
            self.state = self.ckpt.restore(self.state)
            print(f"Restored checkpoint at step {int(self.state.step)}")

        if self.mesh is not None:
            # tp: generator trunk + encoder/discriminator/VGG kernels
            # channel-sharded (Megatron col/row) and the Adam moments along
            # with them; spatial mode replicates params (activations shard)
            self.state = shard_train_state(
                self.state, self.mesh, shard_model=not exp.mesh.spatial)

        self.step_gd = make_train_step(self.system, do_g=True)
        self.step_d = (make_train_step(self.system, do_g=False)
                       if exp.train.d_steps_per_g > 1 else None)

    def make_dataloader(self) -> DataLoader:
        """Train loader; under multi-host (multi-process) JAX each host reads
        a disjoint stripe of every globally-shuffled epoch and yields
        batch_size / process_count samples per step — its rows of the
        GLOBAL batch, assembled on device by shard_batch.  (The reference
        is single-host; this is the TPU-native scale-out path, SURVEY §7
        step 5.)"""
        tc = self.exp.train
        dataset = create_dataset(self.exp, phase="train")
        return DataLoader(dataset, self._per_host_batch(), shuffle=True,
                          drop_last=True, seed=tc.seed,
                          shard_index=jax.process_index(),
                          num_shards=jax.process_count())

    def _per_host_batch(self) -> int:
        """batch_size is the GLOBAL batch; each host loads its share."""
        b, nproc = self.exp.train.batch_size, jax.process_count()
        if b % nproc:
            raise ValueError(
                f"global batch_size {b} not divisible by "
                f"{nproc} processes")
        return b // nproc

    def _device_batch(self, batch: Dict) -> Dict:
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        if self.mesh is not None:
            return shard_batch(arrays, self.mesh,
                               spatial=self.exp.mesh.spatial)
        return {k: jax.device_put(v) for k, v in arrays.items()}

    def variables(self) -> SystemVariables:
        s = self.state
        return SystemVariables(g=s.g_vars, e=s.e_vars, d=s.d_vars, vgg=s.vgg)

    def eval_variables(self) -> SystemVariables:
        """Variables for the per-host eval sweep: the evaluator's jits take
        host-local batches (each host sweeps its loader stripe), so on
        multi-process runs the params are pulled to host-local copies
        first (global-mesh arrays mixed with local inputs fail at
        dispatch).  Tensor-sharded params are all-gathered inside
        host_local_variables — one replicating jit per eval trigger."""
        v = self.variables()
        if jax.process_count() > 1:
            from deepsee_tpu.parallel import host_local_variables

            # device_put once: numpy leaves would re-upload the whole
            # param set host->device on EVERY eval batch (uncommitted
            # inputs are not transfer-cached by jit)
            v = jax.device_put(host_local_variables(v),
                               jax.local_devices()[0])
        return v

    def run(self, dataloader: Optional[DataLoader] = None,
            val_loader: Optional[DataLoader] = None,
            max_steps: Optional[int] = None) -> TrainState:
        exp = self.exp
        tc = exp.train

        if dataloader is None:
            dataloader = self.make_dataloader()

        # lockstep bound: every step runs global-mesh collectives, so all
        # hosts must take the SAME number of steps per epoch.  Per-host
        # stripes can differ by one sample (strided sharding); truncate
        # to the count every host is guaranteed to reach — computable
        # locally from the global dataset size, no collective needed.
        steps_per_epoch = len(dataloader)
        if jax.process_count() > 1:
            steps_per_epoch = min(
                steps_per_epoch,
                (len(dataloader.dataset) // jax.process_count())
                // dataloader.batch_size)

        # continue_train resumes the epoch counter from iter.txt — without
        # it a resumed run restarts at epoch 1 and set_epoch_lr silently
        # re-applies the UNdecayed lr for the rest of training
        # (trainer_manager.py:76-96 + iter_counter.py:30-47 interplay)
        counter = IterationCounter(exp, steps_per_epoch * tc.batch_size,
                                   continue_train=self.continue_train)
        visualizer = Visualizer(exp)
        evaluator = None  # built lazily at the first evaluation trigger
        if val_loader is None and tc.evaluate_val_set:
            from deepsee_tpu.eval.evaluator import get_validation_loader
            val_loader = get_validation_loader(exp)

        # dedicated loader for the periodic training-set evaluation, fully
        # isolated from the live training stream: a shallow COPY of the
        # dataset (shares the immutable file lists, gets its own
        # augmentation Random via seed() — datasets.py:102-103 rebinds
        # self.rng) so concurrent eval decode threads never consume draws
        # from the training dataset's RNG; no prefetch thread (the
        # evaluator takes num_evaluation_samples and leaves)
        import copy as _copy
        eval_dataset = _copy.copy(dataloader.dataset)
        eval_loader = DataLoader(
            eval_dataset, self._per_host_batch(), shuffle=True,
            drop_last=True, seed=tc.seed + 7919, num_workers=2, prefetch=0,
            shard_index=jax.process_index(),
            num_shards=jax.process_count())

        logs: Dict[str, float] = {}
        try:
            for epoch in counter.training_epochs():
                counter.record_epoch_start(epoch)
                self.state = set_epoch_lr(self.state, exp, epoch)
                for i, batch in enumerate(dataloader):
                    if i >= steps_per_epoch:
                        break
                    device_batch = self._device_batch(batch)
                    do_g = (i % tc.d_steps_per_g == 0)
                    step_fn = (self.step_gd if do_g or self.step_d is None
                               else self.step_d)
                    self.state, logs = step_fn(self.state, device_batch)
                    counter.record_one_iteration()

                    if counter.needs_printing():
                        visualizer.print_current_errors(
                            epoch, counter.epoch_iter,
                            jax.device_get(logs), counter.time_per_iter)
                    if counter.needs_displaying():
                        self._display(visualizer, device_batch, epoch,
                                      counter.total_steps_so_far)
                    if counter.needs_saving():
                        self.ckpt.save(int(self.state.step), self.state,
                                       tag="latest")
                        counter.record_current_iter()
                    if (counter.needs_evaluation()
                            and epoch >= tc.evaluation_start_epoch):
                        if evaluator is None:
                            evaluator = InferenceEvaluator(
                                self.system, tc.num_evaluation_samples,
                                compute_fid=True,
                                inception_weights=tc.inception_weights or None,
                                alexnet_weights=tc.alexnet_weights or None)
                        # reference train.py:85-105: evaluate the training
                        # set (FID + metrics history), plus the val set when
                        # --evaluate_val_set; exhaustion -> FID 500 fallback
                        ev_vars = self.eval_variables()
                        result = evaluate_set(evaluator, ev_vars,
                                              eval_loader)
                        counter.record_fid(result.get("FID", 500.0), "train",
                                           tc.num_evaluation_samples)
                        counter.record_metrics(result, "train",
                                               tc.num_evaluation_samples)
                        if val_loader is not None:
                            result_val = evaluate_set(
                                evaluator, ev_vars, val_loader)
                            counter.record_fid(result_val.get("FID", 500.0),
                                               "validation",
                                               tc.num_evaluation_samples)
                            counter.record_metrics(result_val, "validation",
                                                   tc.num_evaluation_samples)
                    if max_steps and int(self.state.step) >= max_steps:
                        return self.state

                counter.record_epoch_end()
                if epoch % tc.save_epoch_freq == 0:
                    self.ckpt.save(int(self.state.step), self.state,
                                   tag=f"epoch_{epoch}")
        except KeyboardInterrupt:
            print("Interrupted — saving 'latest' before exit "
                  "(train.py:119-127)")
            raise
        except Exception:
            traceback.print_exc()
            raise
        finally:
            try:
                self.ckpt.save(int(self.state.step), self.state, tag="latest")
                counter.record_current_iter()
            except Exception as e:  # noqa: BLE001
                print(f"crash-save failed: {e}")

        print("Training was successfully finished.")
        return self.state

    def _display(self, visualizer: Visualizer, device_batch: Dict,
                 epoch: int, step: int) -> None:
        # Jitted path (generate_jit caches on the fixed per-run shapes, so
        # this costs ONE extra compile, not a trace per display): the eager
        # per-op dispatch it replaces stalled a real 256 px run for minutes
        # on the first display trigger (ARCHITECTURE.md eager-vs-jit
        # measurement: 191 s eager sweep vs 0.2 s jitted).
        # The generate runs on EVERY host (SPMD collectives inside); the
        # all-gather below must therefore also run on every host, and only
        # the main process writes.  Fetching must reassemble the FULL first
        # sample: under spatial sharding a single shard is a 1/model_axis
        # horizontal stripe, and on a multi-host mesh row 0 may not even be
        # addressable here.
        pre = self.system.preprocess_jit(device_batch)
        fake, _ = self.system.generate_jit(
            self.state.g_vars, self.state.e_vars, pre, None,
            self.system.cfg.full_style_image, True, None)

        def first_sample(arr):
            if getattr(arr, "sharding", None) is None or \
                    arr.sharding.is_fully_addressable:
                return np.asarray(jax.device_get(arr))[0]
            from jax.experimental import multihost_utils

            # gather ONE sample, not the global batch: slicing first keeps
            # the cross-host traffic at 1 x H x W x C per visual instead of
            # B x H x W x C.  The slice runs under an explicit jit —
            # non-jit ops on non-fully-addressable arrays are rejected by
            # jax_spmd_mode='allow_jit'; under spatial sharding the H
            # shards still reassemble correctly after the gather.
            head = _first_row(arr)
            return np.asarray(
                multihost_utils.process_allgather(head, tiled=True))[0]

        from deepsee_tpu.utils.files import is_main_process
        main = is_main_process()

        def first_local(arr):
            # every host participates in the gather; non-main drops it
            full = first_sample(arr)
            return full if main else None

        visuals = {
            "input_label": first_local(pre["label"]),
            "image_lr": first_local(pre["image_lr"]),
            "synthesized_image": first_local(fake),
            "real_image": first_local(pre["image_hr"]),
        }
        if main:
            visualizer.display_current_results(visuals, epoch, step)
