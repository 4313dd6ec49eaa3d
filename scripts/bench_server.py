#!/usr/bin/env python
"""Measure the HTTP serving daemon end-to-end (client -> daemon -> device).

Exports a serving artifact for the requested config, starts the daemon
in-process (single device owner), and hammers it with concurrent HTTP
clients sending real base64-PNG requests.  Reports served img/s, latency
percentiles, and the micro-batcher's fill ratio — the serving-stack
number to put next to the raw device rates in ARCHITECTURE.md (bench.py:
device-only; this includes PNG codec + HTTP + batching overhead, which
is host-CPU-bound: scale expectations by core count like the loader
bench, scripts/bench_loader.py).

  python scripts/bench_server.py --name 8x_independent_256x256 \
      --trace_batch 8 --clients 16 --n_requests 128 [--int8]

`--encoding raw` benches the raw-tensor wire mode (b64 of uint8 bytes,
no PNG) — the production setting for callers that already hold pixel
buffers, and the honest view of the serving stack when the bench host's
CPU can't also pay the PNG zlib passes.  `--encoding bin` benches
/v1/super_resolve_bin (octet-stream, no JSON/base64 at all) — the
cheapest wire the daemon speaks.
"""

from __future__ import annotations

import argparse
import base64
import concurrent.futures
import io
import json
import os
import sys
import tempfile
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _png_b64(arr_u8: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _native_codec_available() -> bool:
    try:
        from deepsee_tpu import native

        return native.available()
    except Exception:
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="8x_independent_256x256")
    p.add_argument("--checkpoint", default="",
                   help="orbax run dir (default: random-init weights — "
                        "throughput is weight-independent)")
    p.add_argument("--trace_batch", type=int, default=8)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--n_requests", type=int, default=128)
    p.add_argument("--batch_window_ms", type=float, default=5.0)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--platform", default="",
                   help="export platform (default: the default backend)")
    p.add_argument("--encoding", default="png",
                   choices=("png", "raw", "bin"),
                   help="wire format (raw = b64 uint8 bytes in JSON; "
                        "bin = /v1/super_resolve_bin octet-stream)")
    p.add_argument("--png_level", type=int, default=6,
                   help="daemon-side response PNG zlib level (<=2 also "
                        "skips row filtering in the native encoder)")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        # pin the host backend (the axon sitecustomize would otherwise
        # re-point jax at the TPU regardless of JAX_PLATFORMS)
        jax.config.update("jax_platforms", "cpu")

    from deepsee_tpu.config import get_preset
    from deepsee_tpu.serve import export_serving, save_serving
    from deepsee_tpu.server import ServingServer
    from deepsee_tpu.system import SRSystem
    from deepsee_tpu.utils.compile_cache import enable_compilation_cache

    if jax.default_backend() != "cpu":
        enable_compilation_cache()
    if args.name == "tiny_test":  # CPU smoke-test escape
        from deepsee_tpu.config import tiny_test_experiment

        exp = tiny_test_experiment(is_train=False)
    else:
        exp = get_preset(args.name).replace(is_train=False)
    cfg = exp.model
    system = SRSystem(exp)
    if args.checkpoint:
        from deepsee_tpu.utils.checkpoint import load_inference_variables

        variables = load_inference_variables(
            exp, checkpoints_dir=args.checkpoint)
    else:
        variables = system.init(jax.random.PRNGKey(0))

    platform = args.platform or jax.default_backend()
    print(f"exporting {args.name} b{args.trace_batch} for {platform} "
          f"({'int8' if args.int8 else 'bf16'})...", flush=True)
    blobs = export_serving(exp, variables, batch_size=args.trace_batch,
                           platforms=(platform,),
                           quantize="int8" if args.int8 else "")
    tmp = tempfile.mkdtemp(prefix="deepsee_bench_srv_")
    save_serving(tmp, exp, blobs, batch_size=args.trace_batch,
                 platforms=(platform,))

    import deepsee_tpu.server as server_mod

    server_mod.PNG_ENCODE_LEVEL = args.png_level
    srv = ServingServer(tmp, port=0, batch_window_ms=args.batch_window_ms)
    srv.start()
    binary = args.encoding == "bin"
    url = (f"http://127.0.0.1:{srv.port}/v1/super_resolve_bin" if binary
           else f"http://127.0.0.1:{srv.port}/v1/super_resolve")

    rng = np.random.RandomState(0)
    guided = cfg.guiding_style_image
    enc = (_png_b64 if args.encoding == "png" else
           lambda a: base64.b64encode(
               np.ascontiguousarray(a).tobytes()).decode("ascii"))
    bodies = []
    for _ in range(8):  # a small pool of distinct payloads
        lr = rng.randint(0, 256, (cfg.start_size, cfg.start_size, 3),
                         dtype=np.uint8)
        lab = rng.randint(0, cfg.label_nc,
                          (cfg.crop_size, cfg.crop_size)).astype(np.uint8)
        g_img = (rng.randint(0, 256, (cfg.crop_size, cfg.crop_size, 3),
                             dtype=np.uint8) if guided else None)
        if binary:
            raw = lr.tobytes() + lab.tobytes()
            if guided:
                raw += g_img.tobytes() + lab.tobytes()
            bodies.append(raw)
            continue
        b = {"image_lr": enc(lr), "label": enc(lab)}
        if args.encoding != "png":
            b["encoding"] = args.encoding
        if guided:
            b["guiding_image"] = enc(g_img)
            b["guiding_label"] = b["label"]
        bodies.append(json.dumps(b).encode())

    content_type = ("application/octet-stream" if binary
                    else "application/json")

    def call(i: int) -> float:
        t0 = time.perf_counter()
        req = urllib.request.Request(
            url, data=bodies[i % len(bodies)],
            headers={"Content-Type": content_type})
        with urllib.request.urlopen(req, timeout=1200) as r:
            blob = r.read()
            if not binary:
                json.loads(blob)
        return time.perf_counter() - t0

    print("warmup (first call compiles on the backend)...", flush=True)
    call(0)
    srv.batcher.reset_stats()  # don't let warmup bias the fill ratio

    lat = []
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(args.clients) as pool:
        lat = list(pool.map(call, range(args.n_requests)))
    wall = time.perf_counter() - t0

    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30) as r:
        health = json.loads(r.read())
    srv.stop()

    lat = np.asarray(sorted(lat))
    out = {
        "metric": "served_img_per_s_http",
        "value": round(args.n_requests / wall, 2),
        "unit": "img/s",
        "config": args.name,
        "trace_batch": args.trace_batch,
        "clients": args.clients,
        "n_requests": args.n_requests,
        "quantize": "int8" if args.int8 else "bf16",
        "platform": platform,
        "encoding": args.encoding,
        "latency_ms": {
            "p50": round(float(lat[len(lat) // 2]) * 1e3, 1),
            "p90": round(float(lat[int(len(lat) * 0.9)]) * 1e3, 1),
            "p99": round(float(lat[min(len(lat) - 1,
                                       int(len(lat) * 0.99))]) * 1e3, 1),
        },
        "batch_fill": health["stats"]["batch_fill"],
        "cpu_count": os.cpu_count(),
        "png_level": args.png_level,
        "native_codec": _native_codec_available(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
