#!/usr/bin/env python
"""Compiler-measured per-chip HBM for the multi-chip 512px train step.

AOT-compiles the FULL fused GAN train step against a *described* TPU
topology (jax.experimental.topologies — no chips needed) with the real
dp x tp and dp x sp sharding specs, and reads XLA's memory analysis of the
compiled executable.  This replaces the hand-projected 8-chip HBM budget in
ARCHITECTURE.md with numbers the compiler actually allocated.

  python scripts/aot_hbm.py --name 32x_guided_512x512 --global_batch 8
  python scripts/aot_hbm.py --topology v5e:2x4 --meshes dp4xtp2,dp2xsp4

Per mesh, prints one JSON line with per-chip argument/temp/output bytes.
All sizes are PER CHIP: every abstract input leaf carries a NamedSharding
over the topology mesh, so the executable is the per-device SPMD program.
Runs entirely on the host (the TPU compiler runs without a device); safe
to run while the real chip is busy.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GIB = 2.0**30


def parse_mesh(spec: str):
    """'dp4xtp2' -> (4, 2, tensor), 'dp2xsp4' -> (2, 4, spatial)."""
    m = re.fullmatch(r"dp(\d+)x(tp|sp)(\d+)", spec)
    if not m:
        raise ValueError(f"mesh spec {spec!r} (want e.g. dp4xtp2, dp2xsp4)")
    return int(m.group(1)), int(m.group(3)), m.group(2) == "sp"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="32x_guided_512x512")
    p.add_argument("--global_batch", type=int, default=8)
    p.add_argument("--topology", default="v5e:2x4",
                   help="jax topology name (v5e:2x4 = a v5e-8)")
    p.add_argument("--meshes", default="dp4xtp2,dp2xsp4")
    p.add_argument("--remat", action="store_true", default=True)
    p.add_argument("--no_remat", dest="remat", action="store_false")
    p.add_argument("--remat_policy", default="full",
                   choices=("full", "convs"))
    args = p.parse_args()

    import jax
    # pin the host platform: the described-topology AOT compile needs no
    # device client, and the axon sitecustomize would otherwise grab the
    # (single-tenant) TPU the moment any concrete array is built
    jax.config.update("jax_platforms", "cpu")
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.parallel import train_state_shardings
    from deepsee_tpu.parallel.mesh import (DATA_AXIS, DCN_AXIS, MODEL_AXIS,
                                           batch_spec)
    from deepsee_tpu.system import SRSystem
    from deepsee_tpu.train.state import create_train_state
    from deepsee_tpu.train.steps import make_train_step

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=args.topology,
        chip_config_name="default")
    n_dev = len(topo.devices)

    exp = get_preset(args.name)
    exp = exp.replace(train=dataclasses.replace(
        exp.train, batch_size=args.global_batch, remat=args.remat,
        remat_policy=args.remat_policy))
    cfg = exp.model
    system = SRSystem(exp)

    # abstract state: shapes/dtypes only, nothing allocated
    state_shapes = jax.eval_shape(
        lambda k: create_train_state(system, k), jax.random.PRNGKey(0))
    b = args.global_batch
    batch_shapes = {
        "image_hr": jax.ShapeDtypeStruct(
            (b, cfg.crop_size, cfg.crop_size, 3), np.float32),
        "label": jax.ShapeDtypeStruct(
            (b, cfg.crop_size, cfg.crop_size), np.int32),
    }
    if cfg.guiding_style_image:
        batch_shapes["guiding_image"] = jax.ShapeDtypeStruct(
            (b, cfg.crop_size, cfg.crop_size, 3), np.float32)
        batch_shapes["guiding_label"] = jax.ShapeDtypeStruct(
            (b, cfg.crop_size, cfg.crop_size), np.int32)

    step = make_train_step(system, donate=True)

    for spec in args.meshes.split(","):
        dp, mp, spatial = parse_mesh(spec)
        if dp * mp != n_dev:
            raise ValueError(f"{spec}: {dp}x{mp} != {n_dev} devices")
        mesh = Mesh(np.asarray(topo.devices).reshape(1, dp, mp),
                    (DCN_AXIS, DATA_AXIS, MODEL_AXIS))

        st_sh = train_state_shardings(state_shapes, mesh,
                                      shard_model=not spatial)
        abstract_state = jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            state_shapes, st_sh)
        abstract_batch = {
            k: jax.ShapeDtypeStruct(
                v.shape, v.dtype,
                sharding=NamedSharding(
                    mesh, batch_spec(spatial and len(v.shape) >= 3)))
            for k, v in batch_shapes.items()}

        compiled = step.lower(abstract_state, abstract_batch).compile()
        ma = compiled.memory_analysis()
        out = {
            "config": args.name, "topology": args.topology, "mesh": spec,
            "global_batch": b, "img_per_chip": b // dp,
            "remat": args.remat, "remat_policy": args.remat_policy,
            "per_chip_gib": {
                "arguments": round(ma.argument_size_in_bytes / GIB, 3),
                "temp": round(ma.temp_size_in_bytes / GIB, 3),
                "output": round(ma.output_size_in_bytes / GIB, 3),
                "alias": round(ma.alias_size_in_bytes / GIB, 3),
                # donated state aliases onto arguments: live peak is
                # args + temp + (outputs - aliased)
                "peak": round((ma.argument_size_in_bytes
                               + ma.temp_size_in_bytes
                               + ma.output_size_in_bytes
                               - ma.alias_size_in_bytes) / GIB, 3),
            },
            "source": "xla_memory_analysis_aot_topology",
        }
        print(json.dumps(out))


if __name__ == "__main__":
    main()
