"""Persistent XLA compilation cache wiring (utils/compile_cache.py).

The cache's real payoff is on the tunneled TPU (multi-minute compiles
skipped on repeat runs — measured numbers in ARCHITECTURE.md); here we
verify the wiring end-to-end on CPU: enabling writes executable entries
to the chosen dir, and the CLI flags behave.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import pytest


@pytest.fixture
def restore_cache_config():
    yield
    jax.config.update("jax_compilation_cache_dir", None)


def test_enable_writes_entries(tmp_path, restore_cache_config):
    from deepsee_tpu.utils.compile_cache import enable_compilation_cache

    d = str(tmp_path / "xla")
    assert enable_compilation_cache(d) == d
    assert os.path.isdir(d)
    # drop the time threshold so the tiny CPU program qualifies
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    f = jax.jit(lambda x: jnp.tanh(x @ x.T) + 1.0)
    f(jnp.ones((64, 64), jnp.float32)).block_until_ready()
    assert os.listdir(d), "no cache entry written"


def test_cli_flags(tmp_path, restore_cache_config):
    from deepsee_tpu.utils.compile_cache import (add_cache_args,
                                                 apply_cache_args)

    p = argparse.ArgumentParser()
    add_cache_args(p)

    d = str(tmp_path / "c")
    args = p.parse_args(["--compilation_cache", d])
    assert apply_cache_args(args) == d

    args = p.parse_args(["--no_compilation_cache"])
    assert apply_cache_args(args) is None

    # default (no flags) on the CPU backend: stays off — the default-on
    # path targets accelerators, where compiles cost minutes
    args = p.parse_args([])
    assert jax.default_backend() == "cpu"
    assert apply_cache_args(args) is None
