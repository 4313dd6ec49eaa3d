"""Numpy-level API over the native codec (see native/__init__.py).

All functions return None when the native library is unavailable or the
input falls outside the exact-parity envelope (unsupported color type,
out-of-bounds crop, non-JPEG/PNG bytes) — callers fall back to PIL.  Genuine
IO errors (missing file) raise, matching the PIL path's behavior.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

from deepsee_tpu import native
from deepsee_tpu.native import BICUBIC, BILINEAR, NEAREST, DsnOps

_FALLBACK = (native.ERR_FORMAT, native.ERR_DECODE, native.ERR_UNSUPPORTED,
             native.ERR_BOUNDS, native.ERR_DIMS)


def _u8p(buf: bytes):
    return ctypes.cast(ctypes.c_char_p(buf), ctypes.POINTER(ctypes.c_uint8))


def _check(rc: int, path: Optional[str] = None) -> bool:
    """True = success; False = fall back to PIL; raises on IO errors."""
    if rc == native.OK:
        return True
    if rc == native.ERR_IO:
        raise FileNotFoundError(path or "native codec: unreadable input")
    if rc in _FALLBACK:
        return False
    raise RuntimeError(f"native codec: unexpected status {rc}")


def decode_image(src, ops: DsnOps, out_hw: Tuple[int, int]
                 ) -> Optional[np.ndarray]:
    """JPEG/PNG (path or bytes) -> float32 (H, W, 3) in [-1, 1]."""
    lib = native.load()
    if lib is None:
        return None
    h, w = out_hw
    out = np.empty((h, w, 3), dtype=np.float32)
    outp = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    if isinstance(src, (str, os.PathLike)):
        rc = lib.dsn_decode_image_file(os.fspath(src).encode(), ops, w, h,
                                       outp)
    else:
        rc = lib.dsn_decode_image(_u8p(src), len(src), ops, w, h, outp)
    return out if _check(rc, src if isinstance(src, str) else None) else None


def decode_label(src, ops: DsnOps, out_hw: Tuple[int, int],
                 map255_to: int) -> Optional[np.ndarray]:
    """PNG/JPEG label map -> int32 (H, W); 255 -> map255_to."""
    lib = native.load()
    if lib is None:
        return None
    h, w = out_hw
    out = np.empty((h, w), dtype=np.int32)
    outp = out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    if isinstance(src, (str, os.PathLike)):
        rc = lib.dsn_decode_label_file(os.fspath(src).encode(), ops,
                                       map255_to, w, h, outp)
    else:
        rc = lib.dsn_decode_label(_u8p(src), len(src), ops, map255_to, w, h,
                                  outp)
    return out if _check(rc, src if isinstance(src, str) else None) else None


def decode_u8(data: bytes, ops: DsnOps, out_hw: Tuple[int, int],
              channels: int = 3) -> Optional[np.ndarray]:
    """Decode to raw uint8 (server wire path; no normalization)."""
    lib = native.load()
    if lib is None:
        return None
    h, w = out_hw
    shape = (h, w, 3) if channels == 3 else (h, w)
    out = np.empty(shape, dtype=np.uint8)
    rc = lib.dsn_decode_u8(_u8p(data), len(data), ops, channels, w, h,
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if _check(rc) else None


def probe(data: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) of a JPEG/PNG byte stream, or None."""
    lib = native.load()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.dsn_probe(_u8p(data), len(data), ctypes.byref(w),
                       ctypes.byref(h))
    return (w.value, h.value) if rc == native.OK else None


def encode_png(arr: np.ndarray, level: int = 6) -> Optional[bytes]:
    """uint8 (H, W, 3) or (H, W) -> PNG bytes.  levels <= 2 skip row
    filtering for the fast serving path (larger bytes, much less zlib)."""
    lib = native.load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    channels = 3 if arr.ndim == 3 else 1
    h, w = arr.shape[:2]
    # Worst case: one filter byte per row, then deflate's worst-case
    # expansion of ~5 bytes per 16 KiB block (deflateBound-style margin;
    # stored blocks may be emitted at <=16383-byte granularity), plus
    # zlib/PNG chunk headers.
    raw = arr.nbytes + h
    cap = raw + 5 * (raw // 16383 + 1) + 4096
    out = np.empty(cap, dtype=np.uint8)
    n = lib.dsn_encode_png(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h, channels,
        level, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    return out[:n].tobytes() if n >= 0 else None


def make_ops(center_crop: int = 0, resize: Optional[Tuple[int, int]] = None,
             crop: Optional[Tuple[int, int, int, int]] = None,
             flip: bool = False, resample: int = BICUBIC,
             scaled_decode: bool = False) -> DsnOps:
    """resize = (w, h); crop = (x, y, w, h)."""
    ops = DsnOps()
    ops.center_crop = center_crop
    if resize:
        ops.resize_w, ops.resize_h = resize
    if crop:
        ops.crop_x, ops.crop_y, ops.crop_w, ops.crop_h = crop
    ops.flip = int(flip)
    ops.resample = resample
    ops.scaled_decode = int(scaled_decode)
    return ops


__all__ = ["decode_image", "decode_label", "decode_u8", "probe", "encode_png",
           "make_ops", "NEAREST", "BILINEAR", "BICUBIC", "DsnOps"]
