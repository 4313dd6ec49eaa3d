"""Native host codec: ctypes bindings over libdeepsee_native.so.

The shared library (codec.cpp) fuses decode -> center-crop -> PIL-exact
resample -> crop -> flip -> normalize into one GIL-released C call, so the
thread-pool DataLoader (data/loader.py) parallelizes decoding across physical
cores without Python in the per-sample path.  It rebuilds the host half of the
reference's data pipeline (data/base_dataset.py:87-107) as the native
component the torch original never had.

Build once with ``make -C deepsee_tpu/native`` (or ``python -m
deepsee_tpu.native --build``).  `load()` returns the configured ctypes handle
or None when the library isn't built — callers fall back to the PIL path, so
the native codec is always optional.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdeepsee_native.so")

ABI_VERSION = 3

OK = 0
ERR_IO = -1
ERR_FORMAT = -2
ERR_DECODE = -3
ERR_DIMS = -4
ERR_UNSUPPORTED = -5
ERR_BOUNDS = -6
ERR_CAP = -7

NEAREST, BILINEAR, BICUBIC = 0, 1, 2


class DsnOps(ctypes.Structure):
    """Mirror of codec.cpp's DsnOps (pipeline order: center_crop -> resize ->
    crop -> flip, matching data/transforms.py:_apply_pil)."""

    _fields_ = [
        ("center_crop", ctypes.c_int32),
        ("resize_w", ctypes.c_int32),
        ("resize_h", ctypes.c_int32),
        ("crop_x", ctypes.c_int32),
        ("crop_y", ctypes.c_int32),
        ("crop_w", ctypes.c_int32),
        ("crop_h", ctypes.c_int32),
        ("flip", ctypes.c_int32),
        ("resample", ctypes.c_int32),
        ("scaled_decode", ctypes.c_int32),
    ]


def build(quiet: bool = True) -> bool:
    """Compile the shared library in place.  Returns True on success."""
    try:
        res = subprocess.run(
            ["make", "-C", _DIR, "libdeepsee_native.so"],
            capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0 and not quiet:
        print(res.stdout)
        print(res.stderr)
    return res.returncode == 0 and os.path.exists(_SO)


_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def load(build_if_missing: bool = False) -> Optional[ctypes.CDLL]:
    """Load (and memoize) the native library; None if unavailable.

    build_if_missing compiles it first — used by tests and the --build CLI;
    production runs only pick up a prebuilt .so so data loading never
    surprises users with a compiler invocation.
    """
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed and not build_if_missing:
        return None
    if not os.path.exists(_SO):
        if not (build_if_missing and build()):
            _lib_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _lib_failed = True
        return None

    lib.dsn_abi_version.restype = ctypes.c_int32
    lib.dsn_abi_version.argtypes = []
    if lib.dsn_abi_version() != ABI_VERSION:  # stale build: rebuild or bail
        if build_if_missing and build():
            lib = ctypes.CDLL(_SO)
            lib.dsn_abi_version.restype = ctypes.c_int32
            lib.dsn_abi_version.argtypes = []
            if lib.dsn_abi_version() != ABI_VERSION:
                _lib_failed = True
                return None
        else:
            _lib_failed = True
            return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    opsp = ctypes.POINTER(DsnOps)
    i32, i64 = ctypes.c_int32, ctypes.c_int64

    lib.dsn_decode_image.restype = i32
    lib.dsn_decode_image.argtypes = [u8p, i64, opsp, i32, i32, f32p]
    lib.dsn_decode_image_file.restype = i32
    lib.dsn_decode_image_file.argtypes = [ctypes.c_char_p, opsp, i32, i32,
                                          f32p]
    lib.dsn_decode_label.restype = i32
    lib.dsn_decode_label.argtypes = [u8p, i64, opsp, i32, i32, i32, i32p]
    lib.dsn_decode_label_file.restype = i32
    lib.dsn_decode_label_file.argtypes = [ctypes.c_char_p, opsp, i32, i32,
                                          i32, i32p]
    lib.dsn_decode_u8.restype = i32
    lib.dsn_decode_u8.argtypes = [u8p, i64, opsp, i32, i32, i32, u8p]
    lib.dsn_probe.restype = i32
    lib.dsn_probe.argtypes = [u8p, i64, i32p, i32p]
    lib.dsn_encode_png.restype = i64
    lib.dsn_encode_png.argtypes = [u8p, i32, i32, i32, i32, u8p, i64]

    if not _selfcheck(lib):
        import warnings
        warnings.warn(
            "deepsee_tpu native codec: runtime JPEG parity self-check vs PIL "
            "FAILED (system libjpeg likely differs from Pillow's bundled "
            "libjpeg-turbo) — falling back to the PIL decode path so training "
            "pixels stay reference-exact.", RuntimeWarning)
        _lib_failed = True
        return None

    _lib = lib
    return _lib


def _selfcheck(lib) -> bool:
    """One-shot decode-parity probe: the bit-exact-JPEG guarantee assumes the
    system libjpeg the .so links behaves identically to the libjpeg-turbo
    bundled in the Pillow wheel.  Decode a small in-memory JPEG through both
    and compare; any mismatch disables the native path for this process.
    Runs once per process at load(); ~1 ms.  Set
    DEEPSEE_NATIVE_NO_SELFCHECK=1 to skip (e.g. fuzzing a deliberately
    mismatched build)."""
    if os.environ.get("DEEPSEE_NATIVE_NO_SELFCHECK") == "1":
        return True
    try:
        import io
        import numpy as np
        from PIL import Image
    except ImportError:
        return True  # no PIL to compare against (or fall back to) anyway
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(src).save(buf, format="JPEG", quality=85)
    data = buf.getvalue()
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = np.empty_like(want)
    ops = DsnOps()
    rc = lib.dsn_decode_u8(
        ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8)),
        len(data), ctypes.byref(ops), 3, want.shape[1], want.shape[0],
        got.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return rc == OK and bool((got == want).all())


def available(build_if_missing: bool = False) -> bool:
    return load(build_if_missing) is not None
