"""Multi-host data sharding (VERDICT r1 item 8, SURVEY §7 step 5).

DataLoader(shard_index, num_shards) must give every host a disjoint,
collectively-exhaustive stripe of each globally-shuffled epoch, and the
Trainer must wire jax.process_index()/process_count() into its loader.
"""

import dataclasses

import jax

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.data import DataLoader, SyntheticDataset
from deepsee_tpu.train.loop import Trainer


def _epoch_paths(loader):
    out = []
    for batch in loader:
        out.extend(batch["path"])
    return out


def test_shards_disjoint_and_exhaustive():
    exp = tiny_test_experiment()
    ds = SyntheticDataset(exp, length=16)

    loaders = [DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                          num_workers=1, prefetch=0, seed=7,
                          shard_index=i, num_shards=2) for i in range(2)]
    p0, p1 = _epoch_paths(loaders[0]), _epoch_paths(loaders[1])

    assert len(p0) == len(p1) == 8          # 16 / 2 shards
    assert not set(p0) & set(p1), "shards must be disjoint"
    all_paths = {f"synthetic_{i}.png" for i in range(16)}
    assert set(p0) | set(p1) == all_paths, "shards must cover the epoch"

    # second epoch reshuffles globally but stays disjoint/exhaustive
    q0, q1 = _epoch_paths(loaders[0]), _epoch_paths(loaders[1])
    assert not set(q0) & set(q1)
    assert set(q0) | set(q1) == all_paths
    assert q0 != p0, "epochs should shuffle differently"

    # len() accounts for sharding
    assert len(loaders[0]) == 4  # (16/2) // 2


def test_trainer_wires_process_sharding(monkeypatch):
    exp = tiny_test_experiment().replace(checkpoints_dir="/tmp/ck_unused")
    exp = exp.replace(data=dataclasses.replace(exp.data,
                                               dataset="synthetic"))
    trainer = Trainer(exp)

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    loader = trainer.make_dataloader()
    assert loader.shard_index == 1
    assert loader.num_shards == 2
    # batch_size is GLOBAL: each host loads its share of every batch
    assert loader.batch_size == exp.train.batch_size // 2

    # a global batch not divisible by the process count is an error
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    import pytest
    with pytest.raises(ValueError, match="divisible"):
        trainer.make_dataloader()
