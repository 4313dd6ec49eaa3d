#!/usr/bin/env python
"""Per-phase breakdown of the 512px train step (VERDICT r2 item 1).

Aggregate XLA cost analysis of the fused step cannot distinguish "every
phase at its own roofline" from "scheduling gaps", and xprof traces do not
survive the axon tunnel — so this DECOMPOSES the step into independently
jitted phase programs and measures each one with the same dependency-chain
timing the benchmarks use:

  g_fwd        preprocess + style encode + generator forward (train mode)
  g_fwd_bwd    + backward through G/E params (proxy scalar loss on fake)
  d_fwd        discriminator on the 2B fake+real batch
  d_fwd_bwd    + backward through D params
  vgg_fwd      VGG19 features of fake and real
  vgg_fwd_bwd  VGG loss + backward to the fake image (the path G's grad takes)
  d_update_only  the do_g=False branch (D regen + update, no G step)
  full_step    the fused G+D step exactly as training runs it (the do_g
               branch: full generator update then the D update)

Each phase reports median ms, executed TFLOP (XLA cost analysis), bytes
accessed, and the implied MXU / HBM-bandwidth utilizations; phases + sums
vs the fused step expose any serialization gap.  Bytes-based utilization is
an UPPER BOUND (fusion-internal traffic is counted).

  python scripts/profile_512.py --name 32x_guided_512x512 --batch 1 --remat
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="32x_guided_512x512")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--remat", action="store_true", default=True)
    p.add_argument("--no_remat", dest="remat", action="store_false")
    p.add_argument("--remat_policy", default="full")
    p.add_argument("--chains", type=int, default=3)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--phases", default="",
                   help="comma list to restrict (default: all)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.losses import feature_matching_loss, gan_loss, vgg_loss
    from deepsee_tpu.system import SRSystem
    from deepsee_tpu.train.state import create_train_state
    from deepsee_tpu.train.steps import make_train_step

    exp = get_preset(args.name)
    exp = exp.replace(train=dataclasses.replace(
        exp.train, batch_size=args.batch, remat=args.remat,
        remat_policy=args.remat_policy))
    cfg = exp.model
    tc = exp.train
    system = SRSystem(exp)
    state = create_train_state(system, jax.random.PRNGKey(0))

    b = args.batch
    rng = np.random.RandomState(0)
    batch = {
        "image_hr": jnp.asarray(
            np.tanh(rng.randn(b, cfg.crop_size, cfg.crop_size, 3)),
            jnp.float32),
        "label": jnp.asarray(
            rng.randint(0, cfg.label_nc, (b, cfg.crop_size, cfg.crop_size)),
            jnp.int32),
    }
    if cfg.guiding_style_image:
        batch["guiding_image"] = jnp.asarray(
            np.tanh(rng.randn(b, cfg.crop_size, cfg.crop_size, 3)),
            jnp.float32)
        batch["guiding_label"] = jnp.asarray(
            rng.randint(0, cfg.label_nc, (b, cfg.crop_size, cfg.crop_size)),
            jnp.int32)

    key = jax.random.PRNGKey(1)

    # ---- phase programs (each takes a token for chain timing) -------------

    def tok(batch, token):
        batch = dict(batch)
        batch["image_hr"] = batch["image_hr"] + token * 0.0
        return batch

    def gen_fake(g_params, e_params, batch):
        g_vars = dict(state.g_vars, params=g_params)
        e_vars = (dict(state.e_vars, params=e_params)
                  if state.e_vars is not None else None)
        pre = system.preprocess(batch)
        # train=True to match the training trace (spectral u/v update needs
        # mutable collections; the mutations are discarded)
        fake, _, _ = system.generate(
            g_vars, e_vars, pre, use_full=cfg.guiding_style_image,
            no_noise=not cfg.add_noise, train=True,
            rngs={"noise": key}, mutable=True)
        return fake, pre

    def g_fwd(token):
        fake, _ = gen_fake(state.g_vars["params"],
                           None if state.e_vars is None
                           else state.e_vars["params"], tok(batch, token))
        return jnp.mean(jnp.abs(fake))

    def g_fwd_bwd(token):
        diff = {"g": state.g_vars["params"]}
        if state.e_vars is not None:
            diff["e"] = state.e_vars["params"]

        def loss(diff):
            fake, _ = gen_fake(diff["g"], diff.get("e"), tok(batch, token))
            return jnp.mean(jnp.abs(fake))

        val, grads = jax.value_and_grad(loss)(diff)
        return val + sum(jnp.sum(jnp.abs(g))
                         for g in jax.tree_util.tree_leaves(grads)) * 0.0

    # static fake/pre for D/VGG phases (no G in the program)
    pre_static = jax.jit(system.preprocess)(batch)
    fake_static, _ = jax.jit(
        lambda: gen_fake(state.g_vars["params"],
                         None if state.e_vars is None
                         else state.e_vars["params"], batch))()

    def d_fwd(token):
        fake = fake_static + token * 0.0
        pf, pr, _ = system.discriminate(
            state.d_vars, pre_static["input_semantics"], fake,
            pre_static["image_hr"], train=True, mutable=True)
        return sum(jnp.mean(t[-1]) for t in pf) + sum(
            jnp.mean(t[-1]) for t in pr)

    def d_fwd_bwd(token):
        fake = fake_static + token * 0.0

        def loss(d_params):
            d_vars = dict(state.d_vars, params=d_params)
            pf, pr, _ = system.discriminate(
                d_vars, pre_static["input_semantics"], fake,
                pre_static["image_hr"], train=True, mutable=True)
            return (gan_loss(pf, False, mode=tc.gan_mode)
                    + gan_loss(pr, True, mode=tc.gan_mode))

        val, grads = jax.value_and_grad(loss)(state.d_vars["params"])
        return val + sum(jnp.sum(jnp.abs(g))
                         for g in jax.tree_util.tree_leaves(grads)) * 0.0

    def vgg_fwd(token):
        fake = fake_static + token * 0.0
        f1 = system.vgg_features(state.vgg, fake)
        f2 = system.vgg_features(state.vgg, pre_static["image_hr"])
        return sum(jnp.mean(t) for t in f1) + sum(jnp.mean(t) for t in f2)

    def vgg_fwd_bwd(token):
        def loss(fake):
            return vgg_loss(system.vgg_features(state.vgg, fake),
                            system.vgg_features(state.vgg,
                                                pre_static["image_hr"]),
                            tc.lambda_vgg)

        val, g = jax.value_and_grad(loss)(fake_static + token * 0.0)
        return val + jnp.sum(jnp.abs(g)) * 0.0

    step_g = make_train_step(system, do_g=True, donate=False)
    step_d = make_train_step(system, do_g=False, donate=False)

    def g_update(token):
        _, logs = step_g(state, tok(batch, token))
        return logs["GAN"]

    # full_step: do_g path IS the fused step (G then D update)
    phases = {
        "g_fwd": g_fwd,
        "g_fwd_bwd": g_fwd_bwd,
        "d_fwd": d_fwd,
        "d_fwd_bwd": d_fwd_bwd,
        "vgg_fwd": vgg_fwd,
        "vgg_fwd_bwd": vgg_fwd_bwd,
        "d_update_only": lambda token: step_d(
            state, tok(batch, token))[1]["D_Fake"],
        "full_step": g_update,
    }
    if args.phases:
        keep = set(args.phases.split(","))
        unknown = keep - set(phases)
        if unknown:
            raise SystemExit(f"unknown phase(s) {sorted(unknown)}; "
                             f"choose from {sorted(phases)}")
        phases = {k: v for k, v in phases.items() if k in keep}

    def chain(fn, depth):
        token = jnp.float32(0.0)
        for _ in range(depth):
            token = fn(token)
        return float(jnp.asarray(token).sum())

    results = {}
    for name, fn in phases.items():
        # ONE compile per phase: AOT-lower + compile, then use the SAME
        # executable for the timing chain and the cost analysis (a fresh
        # jax.jit(fn) or a .lower() on an already-called wrapper would
        # recompile — minutes each through the tunnel)
        t_c0 = time.perf_counter()
        if name in ("full_step", "d_update_only"):
            wrapper = step_g if name == "full_step" else step_d
            compiled = wrapper.lower(state, batch).compile()
            key = "GAN" if name == "full_step" else "D_Fake"
            jfn = (lambda token, _c=compiled, _k=key:
                   jnp.float32(_c(state, tok(batch, token))[1][_k]))
        else:
            # f32 in/out so chained calls match the compiled signature
            # (bf16 phase outputs would silently retrace a plain jit)
            f32_fn = lambda t, _f=fn: jnp.float32(_f(t))
            compiled = jax.jit(f32_fn).lower(jnp.float32(0.0)).compile()
            jfn = lambda token, _c=compiled: _c(token)
        compile_s = time.perf_counter() - t_c0
        chain(jfn, 2)  # warmup
        times = []
        for _ in range(args.chains):
            t0 = time.perf_counter()
            chain(jfn, args.depth)
            times.append((time.perf_counter() - t0) / args.depth)
        ms = float(np.median(times)) * 1000.0

        flops = bytes_acc = None
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            bytes_acc = float(ca.get("bytes accessed", 0.0))
        except Exception as e:  # noqa: BLE001
            print(f"# cost_analysis failed for {name}: {e}", file=sys.stderr)

        row = {"phase": name, "ms": round(ms, 1),
               "compile_s": round(compile_s, 1)}
        if flops:
            row["tflop"] = round(flops / 1e12, 2)
            row["mxu_util"] = round(
                flops / 1e12 / (ms / 1000.0) / V5E_BF16_PEAK_TFLOPS, 3)
        if bytes_acc:
            row["gb_accessed"] = round(bytes_acc / 1e9, 1)
            row["hbm_bw_util_ub"] = round(
                bytes_acc / 1e9 / (ms / 1000.0) / V5E_HBM_GBPS, 3)
        results[name] = row
        print(json.dumps(row), flush=True)

    if "full_step" in results:
        parts = [k for k in ("g_fwd_bwd", "d_fwd_bwd", "vgg_fwd_bwd",
                             "d_update_only") if k in results]
        if parts:
            s = sum(results[k]["ms"] for k in parts)
            print(json.dumps({
                "phase": "sum_of_parts", "parts": parts, "ms": round(s, 1),
                "fused_ms": results["full_step"]["ms"],
                "fused_over_sum": round(results["full_step"]["ms"] / s, 3),
            }))


if __name__ == "__main__":
    main()
