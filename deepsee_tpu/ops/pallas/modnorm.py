"""Fused modulated instance norm — Pallas TPU kernel.

Computes, in one kernel launch:

    out = (x - mean_hw(x)) * rsqrt(var_hw(x) + eps) * scale + offset

the hot epilogue of every SPADE/SEAN block (normalize -> modulate,
deepsee_models/networks/normalization.py:105-213).

Design: activations stay in HBM (memory_space=ANY); the kernel streams
(rows x 128-lane) chunks through double-buffered VMEM scratch with explicit
async DMA — statistics pass (f32 accumulation) then apply pass, overlapping
the next chunk's DMA with the current chunk's compute.  One grid program per
(batch, channel-tile).

Status: forward-only (inference/eval), opt-in.  Measured on v5e
(scripts/bench_pallas.py): parity with XLA at batch 4 (1.03x), 0.83x at
batch 16 — XLA's fused reduce+apply is already HBM-efficient for this op,
so the XLA formulation stays the default; this kernel documents the
streaming-DMA pattern for future fusions that XLA cannot express (e.g.
folding the modulation into a conv epilogue).  Correctness tested in
interpret mode (tests/test_pallas.py) and on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_CHUNK_ROWS = 1024  # rows (of 128 lanes) per DMA chunk: 256 KB bf16


def _kernel(x_hbm, s_hbm, o_hbm, out_hbm, xbuf, mbuf, obuf, outbuf, sems,
            *, eps: float, hw: int):
    n_chunks = hw // _CHUNK_ROWS
    b = pl.program_id(0)
    cj = pl.program_id(1)
    lanes = pl.ds(cj * _LANES, _LANES)

    def x_dma(slot, chunk):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(chunk * _CHUNK_ROWS, _CHUNK_ROWS), lanes],
            xbuf.at[slot], sems.at[slot])

    def mod_dma(slot, chunk):
        return (pltpu.make_async_copy(
                    s_hbm.at[b, pl.ds(chunk * _CHUNK_ROWS, _CHUNK_ROWS), lanes],
                    mbuf.at[slot], sems.at[2 + slot]),
                pltpu.make_async_copy(
                    o_hbm.at[b, pl.ds(chunk * _CHUNK_ROWS, _CHUNK_ROWS), lanes],
                    obuf.at[slot], sems.at[4 + slot]))

    def out_dma(slot, chunk):
        return pltpu.make_async_copy(
            outbuf.at[slot],
            out_hbm.at[b, pl.ds(chunk * _CHUNK_ROWS, _CHUNK_ROWS), lanes],
            sems.at[6 + slot])

    # ---- pass 1: statistics (double-buffered x stream) ----
    x_dma(0, 0).start()

    def stat_body(i, acc):
        s, ss = acc
        slot = i % 2

        @pl.when(i + 1 < n_chunks)
        def _():
            x_dma((i + 1) % 2, i + 1).start()

        x_dma(slot, i).wait()
        chunk = xbuf[slot].astype(jnp.float32)
        return (s + jnp.sum(chunk, axis=0, keepdims=True),
                ss + jnp.sum(chunk * chunk, axis=0, keepdims=True))

    zeros = jnp.zeros((1, _LANES), jnp.float32)
    s, ss = jax.lax.fori_loop(0, n_chunks, stat_body, (zeros, zeros))
    mean = s / hw
    var = ss / hw - mean * mean
    inv = jax.lax.rsqrt(var + eps)

    # ---- pass 2: apply (stream x, scale, offset; write out) ----
    x_dma(0, 0).start()
    d_s, d_o = mod_dma(0, 0)
    d_s.start(), d_o.start()

    def apply_body(i, _):
        slot = i % 2

        @pl.when(i + 1 < n_chunks)
        def _():
            nslot = (i + 1) % 2
            x_dma(nslot, i + 1).start()
            n_s, n_o = mod_dma(nslot, i + 1)
            n_s.start(), n_o.start()

        x_dma(slot, i).wait()
        w_s, w_o = mod_dma(slot, i)
        w_s.wait(), w_o.wait()

        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()  # reclaim the staging buffer

        normed = (xbuf[slot].astype(jnp.float32) - mean) * inv
        res = normed * mbuf[slot].astype(jnp.float32) \
            + obuf[slot].astype(jnp.float32)
        outbuf[slot] = res.astype(outbuf.dtype)
        out_dma(slot, i).start()
        return 0

    jax.lax.fori_loop(0, n_chunks, apply_body, 0)
    out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    @pl.when(n_chunks >= 2)
    def _():
        out_dma(n_chunks % 2, n_chunks - 2).wait()


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def modulated_instance_norm(x: jnp.ndarray, scale: jnp.ndarray,
                            offset: jnp.ndarray, eps: float = 1e-5,
                            interpret: bool = False) -> jnp.ndarray:
    """x, scale, offset: (B, H, W, C) NHWC.

    Constraints: C % 128 == 0 and (H*W) % 1024 == 0 (chunked DMA); callers
    fall back to the XLA path otherwise.
    """
    b, h, w, c = x.shape
    hw = h * w
    if c % _LANES != 0 or hw % _CHUNK_ROWS != 0:
        raise ValueError(f"unsupported shape {x.shape} for the fused kernel")

    xs = x.reshape(b, hw, c)
    ss = scale.reshape(b, hw, c)
    os_ = offset.reshape(b, hw, c)

    grid = (b, c // _LANES)
    # ANY-space refs must be whole-array; the kernel slices HBM itself
    hbm_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    kernel = functools.partial(_kernel, eps=eps, hw=hw)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        grid=grid,
        in_specs=[hbm_spec, hbm_spec, hbm_spec],
        out_specs=hbm_spec,
        scratch_shapes=[
            pltpu.VMEM((2, _CHUNK_ROWS, _LANES), x.dtype),       # xbuf
            pltpu.VMEM((2, _CHUNK_ROWS, _LANES), scale.dtype),   # mbuf
            pltpu.VMEM((2, _CHUNK_ROWS, _LANES), offset.dtype),  # obuf
            pltpu.VMEM((2, _CHUNK_ROWS, _LANES), x.dtype),       # outbuf
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(xs, ss, os_)
    return out.reshape(b, h, w, c)
