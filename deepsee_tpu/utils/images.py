"""Tensor <-> image conversions and IO (reference: util/util.py:72-158)."""

from __future__ import annotations

import io
import os
from typing import Optional

import numpy as np
from PIL import Image

from deepsee_tpu.regions import colorize_label


def tensor2im(x: np.ndarray) -> np.ndarray:
    """NHWC [-1,1] float -> uint8 (util/util.py:72-103: scale, clip,
    truncate)."""
    x = np.asarray(x)
    y = (x + 1.0) / 2.0 * 255.0
    return np.clip(y, 0, 255).astype(np.uint8)


def image_to_array(img, size: Optional[int] = None) -> np.ndarray:
    """PIL image -> (1, size, size, 3) float32 in [-1, 1].

    The single source of the input-image convention (u8/255*2-1, BICUBIC
    resize) shared by demo.py and the HTTP server codecs."""
    img = img.convert("RGB")
    if size and img.size != (size, size):
        img = img.resize((size, size), Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0 * 2.0 - 1.0
    return arr[None]


def label_to_array(lab, size: int, label_nc: int) -> np.ndarray:
    """PIL label map -> (1, size, size) int32; NEAREST resize, RGB
    collapsed to one channel, 255 (unknown) -> label_nc.  Shared by
    demo.py and the HTTP server codecs."""
    if lab.size != (size, size):
        lab = lab.resize((size, size), Image.NEAREST)
    arr = np.asarray(lab).astype(np.int32)
    if arr.ndim == 3:
        arr = arr[..., 0]
    arr = np.where(arr == 255, label_nc, arr)
    return arr[None]


def _native_codec():
    try:
        from deepsee_tpu import native
        from deepsee_tpu.native import codec as ncodec
    except Exception:
        return None
    return ncodec if native.available() else None


def image_bytes_to_array(data: bytes, size: Optional[int] = None
                         ) -> np.ndarray:
    """Encoded JPEG/PNG bytes -> (1, size, size, 3) float32 in [-1, 1]:
    native codec when built (bit-exact with the PIL path), PIL otherwise.
    The single probe -> ops -> decode -> fallback sequence; the file and
    b64 entry points (here and server.py) all delegate to it."""
    ncodec = _native_codec()
    if ncodec is not None and size:
        dims = ncodec.probe(data)
        if dims is not None:
            ops = ncodec.make_ops(
                resize=(size, size) if dims != (size, size) else None)
            arr = ncodec.decode_image(data, ops, (size, size))
            if arr is not None:
                return arr[None]
    return image_to_array(Image.open(io.BytesIO(data)), size)


def label_bytes_to_array(data: bytes, size: int, label_nc: int) -> np.ndarray:
    """Encoded PNG/JPEG label-map bytes -> (1, size, size) int32;
    255 (unknown) -> label_nc.  Native codec when built, PIL otherwise."""
    ncodec = _native_codec()
    if ncodec is not None:
        dims = ncodec.probe(data)
        if dims is not None:
            ops = ncodec.make_ops(
                resize=(size, size) if dims != (size, size) else None,
                resample=ncodec.NEAREST)
            arr = ncodec.decode_label(data, ops, (size, size), label_nc)
            if arr is not None:
                return arr[None]
    return label_to_array(Image.open(io.BytesIO(data)), size, label_nc)


def encode_png_bytes(arr_uint8: np.ndarray, level: int = 6) -> bytes:
    """uint8 (H, W, 3) -> PNG bytes: native encoder when built, PIL
    otherwise.  levels <= 2 skip row filtering in the native path (larger
    bytes, much less zlib — the fast serving setting)."""
    ncodec = _native_codec()
    if ncodec is not None:
        data = ncodec.encode_png(arr_uint8, level=level)
        if data is not None:
            return data
    buf = io.BytesIO()
    Image.fromarray(arr_uint8).save(buf, format="PNG", compress_level=level)
    return buf.getvalue()


def image_file_to_array(path: str, size: Optional[int] = None) -> np.ndarray:
    """image_to_array over a file path: native codec when built (bit-exact),
    PIL otherwise."""
    if _native_codec() is not None and size:
        with open(path, "rb") as f:
            return image_bytes_to_array(f.read(), size)
    return image_to_array(Image.open(path), size)


def label_file_to_array(path: str, size: int, label_nc: int) -> np.ndarray:
    """label_to_array over a file path: native codec when built (bit-exact),
    PIL otherwise."""
    if _native_codec() is not None:
        with open(path, "rb") as f:
            return label_bytes_to_array(f.read(), size, label_nc)
    return label_to_array(Image.open(path), size, label_nc)


def label2im(label: np.ndarray, n_label: int = 19) -> np.ndarray:
    """Integer (or one-hot NHWC) label map -> RGB uint8."""
    label = np.asarray(label)
    if label.ndim >= 3 and label.shape[-1] == n_label:  # one-hot
        label = np.argmax(label, axis=-1)
    return colorize_label(label, n_label)


def save_image(arr_uint8: np.ndarray, path: str, create_dir: bool = False):
    if create_dir:
        os.makedirs(os.path.dirname(path), exist_ok=True)
    if arr_uint8.ndim == 2:
        arr_uint8 = np.repeat(arr_uint8[..., None], 3, axis=-1)
    Image.fromarray(arr_uint8).save(path.replace(".jpg", ".png"))


def save_style_matrix(style: np.ndarray, path: str, create_dir: bool = False):
    """(19, S) style matrix -> CSV (util/util.py:150-158)."""
    style = np.asarray(style)
    assert style.ndim == 2, f"expected 2-D style matrix, got {style.shape}"
    assert path.endswith(".csv")
    if create_dir:
        os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savetxt(path, style, delimiter=",")


def load_style_matrix(path: str) -> np.ndarray:
    return np.loadtxt(path, delimiter=",").astype(np.float32)
