"""Test configuration: force an 8-device CPU platform before JAX initializes.

This is the JAX analogue of the reference's only multi-device test pattern
(replicate on >=2 GPUs in one process and compare with serial execution,
Synchronized-BatchNorm-PyTorch/tests/test_sync_batchnorm.py): we simulate an
8-chip mesh with host CPU devices and assert numerical equivalence.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env ships JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU in this build crashes in space-to-batch-converter on backward
# filter convolutions ("Operands to select must be the same shape"); the pass
# is a small-batch conv optimization we can safely skip on CPU.
if "space-to-batch-converter" not in flags:
    flags = (flags + " --xla_disable_hlo_passes=space-to-batch-converter").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon sitecustomize's register() overrides JAX_PLATFORMS; the config
# update below is what actually pins tests to the 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys  # noqa: E402
import types  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Make the read-only reference importable for parity fixtures (tests only).
REFERENCE_ROOT = "/root/reference"


def add_reference_to_path():
    # Append (not prepend): the reference has top-level demo.py/train.py
    # that must not shadow this repo's entry points.
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    # The reference package __init__ imports torchvision (for VGG19); no
    # torchvision in this image, and parity tests never instantiate VGG19.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")

        def _unavailable(*a, **k):
            raise RuntimeError("torchvision stub: not available in tests")

        tv.models.vgg19 = _unavailable
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        tr = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision.transforms"] = tr
        tv.transforms = tr
