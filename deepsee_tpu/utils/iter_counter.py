"""Epoch/iteration bookkeeping with resume support.

Mirrors util/iter_counter.py: tracks epochs, steps and wall time; persists
`iter.txt` for --continue_train resume (:30-47,84-93); appends eval history
files (:100-121); modular-arithmetic triggers for periodic actions
(:123-138).
"""

from __future__ import annotations

import os
import time
from typing import Iterator

import numpy as np

from deepsee_tpu.config import Experiment
from deepsee_tpu.utils.files import is_main_process


class IterationCounter:
    """Counting/trigger logic runs on every process (the loop needs the
    triggers everywhere); file WRITES (iter.txt, fid_iter.txt,
    metrics_iter.txt) happen on process 0 only under multi-host."""

    def __init__(self, exp: Experiment, dataset_size: int,
                 continue_train: bool = False):
        self.exp = exp
        tc = exp.train
        self.dataset_size = dataset_size
        self.batch_size = tc.batch_size
        self.total_epochs = tc.niter + tc.niter_decay
        self.epoch_iter = 0  # iter within current epoch (in #samples)
        self.writes = is_main_process()

        self.checkpoints_dir = os.path.join(exp.checkpoints_dir, exp.name)
        if self.writes:
            os.makedirs(self.checkpoints_dir, exist_ok=True)
        self.iter_record_path = os.path.join(self.checkpoints_dir, "iter.txt")

        self.first_epoch = 1
        self.total_steps_so_far = 0
        self.time_measurements = []
        if continue_train and os.path.exists(self.iter_record_path):
            try:
                vals = np.loadtxt(self.iter_record_path, delimiter=",")
                self.first_epoch = int(vals[0])
                self.epoch_iter = int(vals[1])
                self.total_steps_so_far = int(vals[2])
                print(f"Resuming from epoch {self.first_epoch} "
                      f"at iteration {self.epoch_iter}")
            except Exception as e:  # corrupted record: start fresh
                print(f"Could not load iteration record ({e}); restarting")

        self.epoch_start_time = time.time()
        self.iter_start_time = time.time()
        self.last_iter_time = time.time()
        self.current_epoch = self.first_epoch

    def training_epochs(self) -> Iterator[int]:
        return range(self.first_epoch, self.total_epochs + 1)

    def record_epoch_start(self, epoch: int) -> None:
        self.epoch_start_time = time.time()
        self.epoch_iter = 0
        self.last_iter_time = time.time()
        self.current_epoch = epoch

    def record_one_iteration(self) -> None:
        now = time.time()
        self.time_per_iter = (now - self.last_iter_time) / self.batch_size
        self.last_iter_time = now
        self.total_steps_so_far += self.batch_size
        self.epoch_iter += self.batch_size

    def record_epoch_end(self) -> None:
        elapsed = time.time() - self.epoch_start_time
        print(f"End of epoch {self.current_epoch} / {self.total_epochs} "
              f"\t Time Taken: {elapsed:.0f} sec")
        self.record_current_iter()

    def record_current_iter(self) -> None:
        if not self.writes:
            return
        np.savetxt(self.iter_record_path,
                   (self.current_epoch, self.epoch_iter,
                    self.total_steps_so_far),
                   delimiter=",", fmt="%d")

    def append_eval_history(self, filename: str, value) -> None:
        """fid_iter.txt / metrics_iter.txt style history files (:100-121)."""
        if not self.writes:
            return
        path = os.path.join(self.checkpoints_dir, filename)
        with open(path, "a") as f:
            f.write(f"{self.current_epoch},{self.total_steps_so_far},{value}\n")

    def _time_string(self) -> str:
        import datetime
        return datetime.datetime.now().strftime("%Y/%m/%d-%H:%M:%S")

    def record_fid(self, fid: float, split: str, num_samples: int) -> str:
        """Append one fid_iter.txt line (util/iter_counter.py:100-108)."""
        msg = (f"time={self._time_string()},split={split},"
               f"num_samples={num_samples},epoch={self.current_epoch:03d},"
               f"total_steps_so_far={self.total_steps_so_far:010d},fid={fid}")
        if self.writes:
            with open(os.path.join(self.checkpoints_dir, "fid_iter.txt"),
                      "a") as f:
                f.write(msg + os.linesep)
            print(msg)
        return msg

    def record_metrics(self, metrics: dict, split: str,
                       num_samples: int) -> str:
        """Append one metrics_iter.txt line (util/iter_counter.py:110-121:
        only keys containing psnr/ssim/rmse are written)."""
        msg = (f"time={self._time_string()},split={split},"
               f"num_samples={num_samples},epoch={self.current_epoch:03d},"
               f"total_steps_so_far={self.total_steps_so_far:010d},")
        msg += ",".join(f"{k}={v}" for k, v in metrics.items()
                        if "psnr" in k or "ssim" in k or "rmse" in k)
        if self.writes:
            with open(os.path.join(self.checkpoints_dir, "metrics_iter.txt"),
                      "a") as f:
                f.write(msg + os.linesep)
            print(msg)
        return msg

    # periodic triggers (util/iter_counter.py:123-138)
    def needs_printing(self) -> bool:
        return (self.total_steps_so_far %
                self.exp.train.print_freq) < self.batch_size

    def needs_displaying(self) -> bool:
        return (self.total_steps_so_far %
                self.exp.train.display_freq) < self.batch_size

    def needs_saving(self) -> bool:
        return (self.total_steps_so_far %
                self.exp.train.save_latest_freq) < self.batch_size

    def needs_evaluation(self) -> bool:
        freq = self.exp.train.evaluation_freq
        if freq <= 0:  # disabled (e.g. multi-process tensor-parallel runs)
            return False
        return (self.total_steps_so_far % freq) < self.batch_size
