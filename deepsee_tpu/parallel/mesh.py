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

DCN_AXIS = "dcn"
DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    """Build the ("dcn", "data", "model") mesh.

    The leading "dcn" axis (size 1 on a single slice) carries the
    multi-slice half of data parallelism: with dcn_axis > 1 on a real
    multi-slice pod the device order groups whole slices along it, so
    only the batch dim and the gradient all-reduce cross the slow
    inter-slice network while tensor/spatial sharding rides ICI.  Specs
    that don't mention an axis replicate over it, so every param/state
    spec below is dcn-compatible unchanged."""
    devices = list(devices if devices is not None else jax.devices())
    n = cfg.n_devices
    if len(devices) < n:
        raise ValueError(f"Mesh wants {n} devices, have {len(devices)}")
    shape = (cfg.dcn_axis, cfg.data_axis, cfg.model_axis)
    if cfg.dcn_axis > 1 and len({getattr(d, "slice_index", 0)
                                 for d in devices[:n]}) > 1:
        # real multi-slice topology: let jax pick a DCN-aware layout
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (1, cfg.data_axis, cfg.model_axis), (cfg.dcn_axis, 1, 1),
            devices=devices[:n])
    else:
        arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_spec(spatial: bool = False) -> P:
    """Batch over ("dcn", "data"); with `spatial`, also shard H over "model".

    Spatial sharding is the conv-net analogue of context parallelism
    (SURVEY.md §5.7): activations stay H-sharded through the conv stack and
    GSPMD inserts the 1-pixel halo exchanges for 3x3 convs over ICI
    automatically; norm statistics over (H, W) become global reductions
    under jit.  Preferred over channel sharding for the >=512px configs
    where feature maps, not weights, dominate memory."""
    batch = (DCN_AXIS, DATA_AXIS)
    return P(batch, MODEL_AXIS) if spatial else P(batch)


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                spatial: bool = False) -> Dict[str, Any]:
    """Shard every array in the batch dict along batch (and optionally H).

    Single-process: a plain device_put with the global sharding.
    Multi-process (a real pod, mesh spanning hosts): each process passes
    only ITS stripe — global_batch / process_count rows, what the
    host-sharded DataLoader yields — and the global array is assembled
    from the per-process stripes (device_put would reject the stripe:
    it expects the full global value on every host).  Verified by the
    real two-process distributed test, tests/test_distributed_multihost.py.
    """
    nproc = jax.process_count()
    out = {}
    for k, v in batch.items():
        spec = batch_spec(spatial and getattr(v, "ndim", 0) >= 3)
        sh = NamedSharding(mesh, spec)
        if nproc > 1:
            v = np.asarray(v)
            global_shape = (v.shape[0] * nproc,) + v.shape[1:]
            out[k] = jax.make_array_from_process_local_data(
                sh, v, global_shape)
        else:
            out[k] = jax.device_put(v, sh)
    return out


def host_local_variables(tree):
    """Pull globally-distributed arrays down to host-local numpy values.

    The in-training eval sweep runs per host on ITS loader stripe
    (eval/evaluator.py): its jits take host-local batches, so the
    variables must be host-local too — a global-mesh array mixed with
    local inputs fails at dispatch on multi-process runs.  Under the
    dp and dp×sp meshes (the recommended 512px layouts) params are
    replicated, so every host already holds a full copy in its first
    addressable shard.  Model(tensor)-sharded params are all-gathered
    first: ONE jitted identity with replicated out-shardings over the
    whole sharded subset (GSPMD emits the all-gathers over ICI; ~0.31
    GiB for the full system at ngf=32, paid once per eval trigger) —
    the reference's in-training eval likewise works under its model
    parallelism (train.py:85-105 with model_parallel_mode set).

    No-op single-process (arrays stay on device, fully addressable)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    sharded_idx = [
        i for i, x in enumerate(leaves)
        if isinstance(x, jax.Array) and not x.sharding.is_fully_addressable
        and not x.sharding.is_fully_replicated]
    if sharded_idx:
        mesh = leaves[sharded_idx[0]].sharding.mesh
        rep = NamedSharding(mesh, P())
        gathered = jax.jit(lambda xs: xs, out_shardings=rep)(
            [leaves[i] for i in sharded_idx])
        for i, g in zip(sharded_idx, gathered):
            leaves[i] = g

    def pull(x):
        if isinstance(x, jax.Array) and not x.sharding.is_fully_addressable:
            # after the gather everything non-addressable is replicated,
            # so shard 0 IS the full array
            assert x.sharding.is_fully_replicated
            return np.asarray(x.addressable_data(0))
        return x

    return jax.tree_util.tree_map(
        pull, jax.tree_util.tree_unflatten(treedef, leaves))


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

# Auxiliary nets — encoder trunks, PatchGAN discriminators, the VGG loss
# net — get the same column->row alternation, keyed on module names:
#   * NLayer D: odd model{N} column / even model{N} row (one psum per pair;
#     model0's input channels are tiny so "even row" never fires there)
#   * encoder trunks: down1|conv1 column feeds up_conv|conv2 row
#   * VGG19 (flat conv{i}_kernel params): odd i column / even i row — the
#     relu taps all land after row convs, so the perceptual-loss features
#     come out channel-complete with no extra resharding
# The width guards keep narrow kernels (< _MIN_SHARD_CH channels, where a
# shard would drop below the 128-wide lane dimension) replicated.
_AUX_COLUMN = re.compile(r"(down1|conv1|model\d*[13579])$")
_AUX_ROW = re.compile(r"(up_conv|conv2|model\d*[02468])$")
_VGG_KERNEL = re.compile(r"^conv(\d+)_kernel$")

_MIN_SHARD_CH = 128  # don't shard narrow kernels


def _spec_for(path: Sequence[str], value, n_model: int,
              min_shard_ch: int = _MIN_SHARD_CH) -> P:
    if value.ndim != 4 or n_model <= 1:
        return P()
    name = path[-2] if len(path) >= 2 else ""
    kh, kw, cin, cout = value.shape
    col_ok = cout % n_model == 0 and cout >= min_shard_ch
    row_ok = cin % n_model == 0 and cin >= min_shard_ch
    # norm_1 modulates conv_1's *input* side (fmiddle) — keep with column
    in_norm_1 = "norm_1" in path
    if _ROW.search(name) and row_ok:
        return P(None, None, MODEL_AXIS, None)
    if (_COLUMN.search(name) or in_norm_1) and col_ok:
        return P(None, None, None, MODEL_AXIS)
    # aux nets wrap their Conv2d in a module named one level up
    # (NonSpadeNormConv's inner conv is literally called "conv")
    for comp in path:
        if _AUX_COLUMN.search(comp):
            return P(None, None, None, MODEL_AXIS) if col_ok else P()
        if _AUX_ROW.search(comp):
            return P(None, None, MODEL_AXIS, None) if row_ok else P()
    return P()


def _vgg_spec(idx: int, value, n_model: int,
              min_shard_ch: int = _MIN_SHARD_CH) -> P:
    """Column/row alternation for the flat-named VGG19 conv kernels."""
    if value.ndim != 4 or n_model <= 1:
        return P()
    kh, kw, cin, cout = value.shape
    if idx % 2 == 1 and cout % n_model == 0 and cout >= min_shard_ch:
        return P(None, None, None, MODEL_AXIS)
    if idx % 2 == 0 and cin % n_model == 0 and cin >= min_shard_ch:
        return P(None, None, MODEL_AXIS, None)
    return P()


def _bias_spec_for(path: Sequence[str], kernel_spec: P) -> P:
    # bias follows the kernel's output-channel sharding
    if len(kernel_spec) == 4 and kernel_spec[3] == MODEL_AXIS:
        return P(MODEL_AXIS)
    return P()


def system_sharding(variables: Dict, mesh: Mesh,
                    shard_model: bool = True,
                    min_shard_ch: int = _MIN_SHARD_CH) -> Dict:
    """Build a NamedSharding pytree matching a variables pytree.

    Generator/encoder/discriminator/VGG conv kernels get tensor-parallel
    specs when `shard_model`; everything else is replicated.  Batch-stats/
    spectral vectors follow their kernels' channel sharding where applicable
    (kept replicated for simplicity — they are tiny).
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
                m = _VGG_KERNEL.match(k)
                if k == "kernel" and shard_model:
                    spec = _spec_for(path + (k,), v, n_model, min_shard_ch)
                elif m and shard_model:
                    spec = _vgg_spec(int(m.group(1)), v, n_model, min_shard_ch)
                else:
                    spec = P()
                kernel_specs[k] = spec
                out[k] = NamedSharding(mesh, spec)
        if "bias" in kernel_specs and "kernel" in kernel_specs:
            out["bias"] = NamedSharding(
                mesh, _bias_spec_for(path, kernel_specs["kernel"]))
        for k, spec in kernel_specs.items():
            m = _VGG_KERNEL.match(k)
            if m and len(spec) == 4 and spec[3] == MODEL_AXIS:
                bias_key = f"conv{m.group(1)}_bias"
                if bias_key in kernel_specs:
                    out[bias_key] = NamedSharding(mesh, P(MODEL_AXIS))
        return out

    return walk(variables, ())


def shard_system_variables(variables: Dict, mesh: Mesh,
                           shard_model: bool = True,
                           min_shard_ch: int = _MIN_SHARD_CH) -> Dict:
    shardings = system_sharding(variables, mesh, shard_model, min_shard_ch)

    def place(v, s):
        return jax.device_put(v, s)

    return jax.tree_util.tree_map(place, variables, shardings)


# -- whole-train-state sharding ---------------------------------------------


def _map_like(tree, template_shardings, fn, expect: str = ""):
    """Apply fn(subtree, shardings) to every subtree of `tree` whose pytree
    structure matches `template_shardings` (used to hit the Adam mu/nu
    moments, which mirror the param tree, without hardcoding optax
    internals).  Matching is purely structural, so an optax version bump
    that reshapes the state tree would silently stop matching — hence the
    zero-match warning (the moments would stay replicated and quietly lose
    the memory savings this exists for)."""
    tdef = jax.tree_util.tree_structure(template_shardings)
    n_matched = 0

    def is_match(x):
        try:
            return jax.tree_util.tree_structure(x) == tdef
        except Exception:  # noqa: BLE001
            return False

    def visit(x):
        nonlocal n_matched
        if is_match(x):
            n_matched += 1
            return fn(x, template_shardings)
        return x

    out = jax.tree_util.tree_map(visit, tree, is_leaf=is_match)
    if n_matched == 0:
        import warnings
        warnings.warn(
            f"_map_like matched NO subtrees{' for ' + expect if expect else ''}"
            " — optimizer moments will stay replicated (optax state layout"
            " changed?)", stacklevel=2)
    return out


def train_state_shardings(state, mesh: Mesh, shard_model: bool = True,
                          min_shard_ch: int = _MIN_SHARD_CH):
    """A NamedSharding pytree mirroring a TrainState.

    Works on a state of real arrays OR of ShapeDtypeStructs (jax.eval_shape)
    — the latter is how the AOT topology path (scripts/aot_hbm.py) gets
    compiler-measured per-chip memory for a described slice without owning
    the chips.  Variables get the tensor-parallel specs; the Adam moments
    (which mirror the param pytrees — optax inits them with zeros_like) get
    their parameters' shardings; everything else replicates."""
    rep = NamedSharding(mesh, P())

    sys_sh = lambda v: (  # noqa: E731
        system_sharding(v, mesh, shard_model, min_shard_ch) if v else v)
    g_sh, e_sh = sys_sh(state.g_vars), sys_sh(state.e_vars)
    d_sh, vgg_sh = sys_sh(state.d_vars), sys_sh(state.vgg)

    # G optimizer owns {"g": g_params, "e": e_params}; D optimizer owns the
    # discriminator params (train/state.py g_diff_params / create_train_state)
    diff_sh = {"g": g_sh["params"]}
    if state.e_vars is not None:
        diff_sh["e"] = e_sh["params"]

    def opt_shardings(opt_state, template, expect):
        marked = _map_like(opt_state, template, lambda _sub, sh: sh,
                           expect=expect)
        return jax.tree_util.tree_map(
            lambda x: x if isinstance(x, jax.sharding.Sharding) else rep,
            marked)

    return state.replace(
        step=rep, rng=rep,
        g_vars=g_sh, e_vars=e_sh, d_vars=d_sh, vgg=vgg_sh,
        opt_g=opt_shardings(state.opt_g, diff_sh, "G Adam moments"),
        opt_d=opt_shardings(state.opt_d, d_sh["params"], "D Adam moments"),
    )


def shard_train_state(state, mesh: Mesh, shard_model: bool = True,
                      min_shard_ch: int = _MIN_SHARD_CH):
    """Shard a TrainState's variables AND its Adam moments over the mesh.

    Without the moment sharding they'd replicate, costing 2x the
    param-sharding savings back in f32.  Spatial mode callers pass
    shard_model=False (params replicated, activations H-sharded)."""
    shardings = train_state_shardings(state, mesh, shard_model, min_shard_ch)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
