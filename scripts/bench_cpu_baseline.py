"""Measured same-hardware baseline: reference torch (CPU) vs this framework
(CPU), identical config, identical inference semantics, same host.

The reference publishes no throughput numbers and no V100 is reachable in
this environment, so bench.py's `vs_baseline` divides by an ANALYTIC 6 img/s
estimate (BASELINE.md).  The reference's torch code DOES run on this host's
CPU (the parity tests instantiate it), so the one honest measured ratio
available is CPU-vs-CPU: the reference driven exactly as its
InferenceManager does (managers/inference_manager.py:55-91 ->
sr_model.py:85-91 generate_fake(no_noise=True); preprocessing per
managers/base_manager.py:50-66 via data/preprocessor.py), against this
framework's jitted preprocess+encode+generate step (the bench.py body).

  python scripts/bench_cpu_baseline.py --size 128 --batch 4 --iters 3
  python scripts/bench_cpu_baseline.py --size 256 --batch 2 --iters 2

Prints one JSON line per run:
  {"metric": "cpu_vs_cpu_8x<size>_inference", "torch_ips": ..,
   "jax_ips": .., "ratio": .., "host_cores": N}

Both sides run float32 (CPU has no native bf16; the reference is fp32-only).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

# Pin JAX to the host CPU before any backend init (the axon sitecustomize
# overrides JAX_PLATFORMS; the config update below is the reliable pin).
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_disable_hlo_passes="
                             "space-to-batch-converter").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)


def _ref_opt(cfg, train_cfg):
    """The argparse namespace the reference networks/Preprocessor expect,
    mapped from a deepsee_tpu ModelConfig (mirrors tests/ref_utils.py)."""
    from types import SimpleNamespace

    return SimpleNamespace(
        efficient=False, regional_style_size=cfg.regional_style_size,
        max_fm_size=cfg.max_fm_size, model_parallel_mode=0,
        norm_G=cfg.norm_g, norm_E=cfg.norm_e, norm_D=cfg.norm_d,
        semantic_nc=cfg.semantic_nc, label_nc=cfg.label_nc,
        contain_dontcare_label=cfg.contain_dontcare_label,
        output_nc=cfg.output_nc, add_noise=cfg.add_noise, netE=cfg.net_e,
        noisy_style_scale=cfg.noisy_style_scale,
        noisy_style_dist=cfg.noisy_style_dist, nef=cfg.nef, ngf=cfg.ngf,
        ndf=cfg.ndf, random_style_matrix=cfg.random_style_matrix,
        crop_size=cfg.crop_size, start_size=cfg.start_size,
        load_size=cfg.load_size, aspect_ratio=cfg.aspect_ratio,
        num_upsampling_layers="normal", num_D=cfg.num_d,
        n_layers_D=cfg.n_layers_d, no_ganFeat_loss=False,
        netD_subarch="n_layer", gpu_info=False, gpu_ids=[], isTrain=False,
        name="cpu_baseline", downsampling_method="bicubic",
        init_type="xavier", init_variance=0.02,
    )


def bench_torch(exp, batch_n: int, iters: int) -> float:
    """Reference inference exactly as InferenceManager.run_batch drives it:
    preprocess (one-hot + bicubic HR->LR, base_manager.py:50-66) ->
    generate_fake(no_noise=True) (sr_model.py:85-91, :566-580)."""
    if REFERENCE not in sys.path:  # append: don't shadow this repo's modules
        sys.path.append(REFERENCE)
    # The reference package __init__ imports torchvision (VGG19); not in this
    # image and never instantiated on this path — stub it like tests/conftest.
    if "torchvision" not in sys.modules:
        import types

        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        tv.models.vgg19 = None
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.transforms"] = tv.transforms
    from data.preprocessor import Preprocessor
    from deepsee_models.networks import define_E, define_SR

    torch.set_num_threads(os.cpu_count() or 1)
    torch.manual_seed(0)
    cfg = exp.model
    opt = _ref_opt(cfg, exp.train)
    net_sr = define_SR(opt).eval()
    net_e = define_E(opt).eval()
    prep = Preprocessor(opt)

    rng = np.random.RandomState(0)
    image_hr = torch.from_numpy(np.tanh(rng.randn(
        batch_n, 3, cfg.crop_size, cfg.crop_size)).astype(np.float32))
    label = torch.from_numpy(rng.randint(
        0, cfg.label_nc, (batch_n, 1, cfg.crop_size, cfg.crop_size))).long()

    def one_batch():
        with torch.no_grad():
            semantics = prep.preprocess_label(label)
            image_lr = prep.downsample_image(image_hr)
            # independent model at eval: mini (LR) style path, no noise
            style, _ = net_e(image_lr, semantics, mode="mini", no_noise=True)
            fake = net_sr(image_lr, seg=semantics, z=style)
        return float(fake.abs().mean())

    one_batch()  # warmup (allocator, thread pool)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        one_batch()
        times.append(time.perf_counter() - t0)
    return batch_n / float(np.median(times))


def bench_jax(exp, batch_n: int, iters: int) -> float:
    """This framework's jitted inference step (the bench.py body) on CPU."""
    from deepsee_tpu.system import SRSystem

    system = SRSystem(exp)
    cfg = exp.model
    variables = system.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    batch = {
        "image_hr": jnp.asarray(np.tanh(rng.randn(
            batch_n, cfg.crop_size, cfg.crop_size, 3)), jnp.float32),
        "label": jnp.asarray(rng.randint(
            0, cfg.label_nc, (batch_n, cfg.crop_size, cfg.crop_size)),
            jnp.int32),
    }

    @jax.jit
    def infer(g_vars, e_vars, batch):
        pre = system.preprocess(batch)
        fake, _, _ = system.generate(g_vars, e_vars, pre, use_full=False,
                                     no_noise=True, train=False)
        return jnp.mean(jnp.abs(fake))

    float(infer(variables.g, variables.e, batch))  # compile + warmup
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(infer(variables.g, variables.e, batch))
        times.append(time.perf_counter() - t0)
    return batch_n / float(np.median(times))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128, choices=(128, 256))
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--side", choices=("both", "torch", "jax"),
                    default="both")
    args = ap.parse_args()

    from deepsee_tpu.config import get_preset

    exp = get_preset(f"8x_independent_{args.size}x{args.size}").replace(
        is_train=False)
    # fp32 on both sides: the reference is fp32-only and CPUs have no
    # native bf16 — like-for-like numerics
    exp = exp.replace(model=dataclasses.replace(
        exp.model, compute_dtype="float32"))

    out = {
        "metric": f"cpu_vs_cpu_8x{args.size}_inference",
        "unit": "img/s (whole host)",
        "batch": args.batch,
        "host_cores": os.cpu_count(),
        "dtype": "float32/float32",
    }
    if args.side in ("both", "jax"):
        out["jax_ips"] = round(bench_jax(exp, args.batch, args.iters), 3)
    if args.side in ("both", "torch"):
        out["torch_ips"] = round(bench_torch(exp, args.batch, args.iters), 3)
    if args.side == "both":
        out["ratio"] = round(out["jax_ips"] / out["torch_ips"], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
