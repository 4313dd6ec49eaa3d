"""Device mesh + sharding layer.

Replaces the reference's parallelism machinery wholesale:

  * DataParallelWithCallback thread scatter/gather (base_manager.py:17-21,
    sync_batchnorm/replicate.py:50-67)      -> batch sharded over the "data"
    mesh axis; gradient all-reduce and global batch-norm statistics come from
    XLA collectives over ICI automatically.
  * model_parallel_mode manual `.cuda(n)` pipeline splits (sr.py:73-92,
    architecture.py:82-125)                  -> tensor parallelism: the 512-
    channel generator trunk kernels are channel-sharded over the "model"
    axis.  Back-to-back convs alternate output-/input-channel sharding
    (Megatron pattern) so GSPMD inserts one reduce per block pair instead of
    resharding every activation.

No NCCL/queue/rendezvous code exists here by design — the sharding specs ARE
the distribution strategy (SURVEY.md §2.9).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepsee_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = cfg.n_devices
    if len(devices) < n:
        raise ValueError(f"Mesh wants {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(cfg.data_axis, cfg.model_axis)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_spec(spatial: bool = False) -> P:
    """Batch over "data"; with `spatial`, additionally shard H over "model".

    Spatial sharding is the conv-net analogue of context parallelism
    (SURVEY.md §5.7): activations stay H-sharded through the conv stack and
    GSPMD inserts the 1-pixel halo exchanges for 3x3 convs over ICI
    automatically; norm statistics over (H, W) become global reductions
    under jit.  Preferred over channel sharding for the >=512px configs
    where feature maps, not weights, dominate memory."""
    return P(DATA_AXIS, MODEL_AXIS) if spatial else P(DATA_AXIS)


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                spatial: bool = False) -> Dict[str, Any]:
    """Shard every array in the batch dict along batch (and optionally H)."""
    out = {}
    for k, v in batch.items():
        spec = batch_spec(spatial and getattr(v, "ndim", 0) >= 3)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


# -- parameter sharding ------------------------------------------------------

# Generator blocks: conv_0 produces the block's inner activation, conv_1
# consumes it.  Column-parallel conv_0 (shard output channels) feeding
# row-parallel conv_1 (shard input channels) yields a single psum at the
# block output.  SEAN modulation convs produce per-channel gamma/beta for the
# inner/outer activations, so they follow the same output sharding as the
# conv they modulate.
_COLUMN = re.compile(
    r"(conv_0|initial|mlp_gamma|mlp_beta|mlp_style_gamma|mlp_style_beta)$")
_ROW = re.compile(r"(conv_1)$")

_MIN_SHARD_CH = 128  # don't shard narrow kernels


def _spec_for(path: Sequence[str], value, n_model: int) -> P:
    if value.ndim != 4 or n_model <= 1:
        return P()
    name = path[-2] if len(path) >= 2 else ""
    kh, kw, cin, cout = value.shape
    # norm_1 modulates conv_1's *input* side (fmiddle) — keep with column
    in_norm_1 = "norm_1" in path
    if _ROW.search(name) and cin % n_model == 0 and cin >= _MIN_SHARD_CH:
        return P(None, None, MODEL_AXIS, None)
    if (_COLUMN.search(name) or in_norm_1) and cout % n_model == 0 \
            and cout >= _MIN_SHARD_CH:
        return P(None, None, None, MODEL_AXIS)
    return P()


def _bias_spec_for(path: Sequence[str], kernel_spec: P) -> P:
    # bias follows the kernel's output-channel sharding
    if len(kernel_spec) == 4 and kernel_spec[3] == MODEL_AXIS:
        return P(MODEL_AXIS)
    return P()


def system_sharding(variables: Dict, mesh: Mesh,
                    shard_model: bool = True) -> Dict:
    """Build a NamedSharding pytree matching a variables pytree.

    Generator trunk kernels get tensor-parallel specs when `shard_model`;
    everything else is replicated.  Batch-stats/spectral vectors follow their
    kernels' channel sharding where applicable (kept replicated for
    simplicity — they are tiny).
    """
    n_model = mesh.shape[MODEL_AXIS]

    def walk(tree, path):
        if not isinstance(tree, dict):
            return None
        out = {}
        kernel_specs = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, path + (k,))
            else:
                if k == "kernel" and shard_model:
                    spec = _spec_for(path + (k,), v, n_model)
                else:
                    spec = P()
                kernel_specs[k] = spec
                out[k] = NamedSharding(mesh, spec)
        if "bias" in kernel_specs and "kernel" in kernel_specs:
            out["bias"] = NamedSharding(
                mesh, _bias_spec_for(path, kernel_specs["kernel"]))
        return out

    return walk(variables, ())


def shard_system_variables(variables: Dict, mesh: Mesh,
                           shard_model: bool = True) -> Dict:
    shardings = system_sharding(variables, mesh, shard_model)

    def place(v, s):
        return jax.device_put(v, s)

    return jax.tree_util.tree_map(place, variables, shardings)
