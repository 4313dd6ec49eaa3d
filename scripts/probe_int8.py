#!/usr/bin/env python
"""Probe: does int8 conv beat bf16 on this TPU for DeepSEE's hot shapes?

v5e advertises 394 TOPS int8 vs 197 TFLOPS bf16.  If XLA lowers s8xs8->s32
convolutions onto the int8 MXU path, a quantized serving mode could ~2x the
conv-bound generator.  This measures the raw conv ratio at the generator's
dominant shapes before building anything.

Prints one JSON line per (shape, dtype) with ms and effective TFLOP/s.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


# (batch, H, W, cin, cout) — the 512-channel trunk at the block sizes that
# dominate 8x 256^2 inference FLOPs (cin == cout so the chain can feed back)
SHAPES = [
    (16, 64, 64, 512, 512),
    (16, 128, 128, 512, 512),
    (16, 256, 256, 64, 64),
]


CHAIN = 32  # convs per jit call: amortizes the ~38 ms tunnel RTT per fetch


@partial(jax.jit, static_argnums=(2,))
def conv_chain(x, k, acc_dtype):
    """CHAIN data-dependent convs; one fetched scalar syncs the whole chain.

    The FULL conv output feeds the next iteration's input (like a real
    network).  Anything less lets XLA narrow the convolution to the consumed
    output positions — a first version fed back only a scalar from
    y[0,0,0,:] and "measured" 3.5x over bf16 peak because each conv was
    legally computed at one pixel."""

    def body(carry, _):
        y = lax.conv_general_dilated(
            carry, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_dtype)
        if carry.dtype == jnp.int8:
            # keep int8 range bounded: the parity of the s32 accumulator
            nxt = (y & 1).astype(jnp.int8) + carry // 2
        else:
            nxt = (y * 1e-3).astype(carry.dtype) + carry * 0.5
        return nxt, y[0, 0, 0, 0].astype(jnp.float32)

    final, ss = lax.scan(body, x, None, length=CHAIN)
    return jnp.sum(ss) + jnp.sum(final[0, 0, 0, :].astype(jnp.float32))


def bench_one(b, h, w, cin, cout, dtype, acc, steps=5):
    rng = np.random.RandomState(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.randint(-2, 2, (b, h, w, cin)), jnp.int8)
        k = jnp.asarray(rng.randint(-2, 2, (3, 3, cin, cout)), jnp.int8)
    else:
        x = jnp.asarray(rng.randn(b, h, w, cin) * 0.01, dtype)
        k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.01, dtype)
    assert cin == cout, "chain benchmark needs cin == cout"
    # compile + warm
    float(jax.device_get(conv_chain(x, k, acc)))
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        float(jax.device_get(conv_chain(x, k, acc)))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) * 1000.0 / CHAIN
    flops = 2 * b * h * w * cin * cout * 9
    return ms, flops / (ms / 1000.0) / 1e12


def main():
    print(f"# devices: {jax.devices()}")
    for (b, h, w, cin, cout) in SHAPES:
        for name, dtype, acc in [("bf16", jnp.bfloat16, jnp.float32),
                                 ("int8", jnp.int8, jnp.int32)]:
            try:
                ms, tflops = bench_one(b, h, w, cin, cout, dtype, acc)
                print(json.dumps({
                    "shape": [b, h, w, cin, cout], "dtype": name,
                    "ms": round(ms, 3), "tflops": round(tflops, 1)}))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "shape": [b, h, w, cin, cout], "dtype": name,
                    "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
