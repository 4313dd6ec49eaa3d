"""Native host codec (deepsee_tpu/native) vs the PIL reference path.

The native codec's contract is BIT-EXACTNESS with the PIL pipeline in its
default mode (data/transforms.py cites data/base_dataset.py:87-107): same
libjpeg decode, a re-implementation of Pillow's fixed-point resampler, the
same f32 normalize.  These tests lock that contract on every surface the
datasets use, plus the approximate scaled-decode fast path's quality bound
and the PIL fallback for unsupported inputs.
"""

import dataclasses
import io
import os

import numpy as np
import pytest
from PIL import Image

from deepsee_tpu import native
from deepsee_tpu.config import get_preset
from deepsee_tpu.data import transforms
from deepsee_tpu.data.datasets import CelebAMaskHQDataset, CelebADataset
from deepsee_tpu.native import codec

pytestmark = pytest.mark.skipif(
    not native.available(build_if_missing=True),
    reason="native codec toolchain unavailable")


def _png(arr, mode=None):
    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return buf.getvalue()


def _jpg(img, quality=95):
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _norm(img):
    return np.asarray(img, dtype=np.float32) / 255.0 * 2.0 - 1.0


# ---------------------------------------------------------------------------
# Resampler exactness
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,out", [
    ((218, 178), (128, 128)),   # CelebA geometry
    ((512, 512), (256, 256)),   # CelebAMask-HQ label geometry
    ((100, 77), (33, 50)),      # odd sizes, anisotropic
    ((64, 64), (200, 120)),     # upscale
])
@pytest.mark.parametrize("filt,pil_filt", [
    (codec.BICUBIC, Image.BICUBIC), (codec.BILINEAR, Image.BILINEAR)])
def test_resample_bit_exact(shape, out, filt, pil_filt):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (*shape, 3), np.uint8)
    img = Image.fromarray(arr)
    oh, ow = out
    ref = _norm(img.resize((ow, oh), pil_filt))
    got = codec.decode_image(_png(arr),
                             codec.make_ops(resize=(ow, oh), resample=filt),
                             (oh, ow))
    np.testing.assert_array_equal(got, ref)


def test_nearest_label_bit_exact():
    rng = np.random.RandomState(1)
    lab = rng.randint(0, 19, (512, 512)).astype(np.uint8)
    lab[0, :40] = 255  # 'unknown' band
    img = Image.fromarray(lab)
    ref = np.asarray(img.resize((256, 256), Image.NEAREST)).astype(np.int32)
    ref[ref == 255] = 19
    got = codec.decode_label(
        _png(lab), codec.make_ops(resize=(256, 256), resample=codec.NEAREST),
        (256, 256), 19)
    np.testing.assert_array_equal(got, ref)


def test_palette_label_keeps_indices():
    rng = np.random.RandomState(2)
    lab = rng.randint(0, 19, (64, 64)).astype(np.uint8)
    pimg = Image.fromarray(lab, mode="P")
    pimg.putpalette([v for i in range(256) for v in (i, 255 - i, i // 2)])
    buf = io.BytesIO()
    pimg.save(buf, format="PNG")
    ref = np.asarray(pimg.resize((32, 32), Image.NEAREST)).astype(np.int32)
    got = codec.decode_label(
        buf.getvalue(),
        codec.make_ops(resize=(32, 32), resample=codec.NEAREST), (32, 32), 19)
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# Decode exactness + full pipeline
# ---------------------------------------------------------------------------

def test_jpeg_decode_bit_exact():
    rng = np.random.RandomState(3)
    img = Image.fromarray(rng.randint(0, 256, (24, 31, 3), np.uint8)).resize(
        (311, 242), Image.BICUBIC)
    for q in (75, 95):
        data = _jpg(img, q)
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        got = codec.decode_u8(data, codec.make_ops(), ref.shape[:2])
        np.testing.assert_array_equal(got, ref)


def test_gray_jpeg_replicates_like_pil_convert():
    rng = np.random.RandomState(4)
    img = Image.fromarray(rng.randint(0, 256, (40, 56), np.uint8), mode="L")
    data = _jpg(img)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = codec.decode_u8(data, codec.make_ops(), ref.shape[:2])
    np.testing.assert_array_equal(got, ref)


def test_celeba_pipeline_bit_exact():
    """center_crop 178 -> resize 128 bicubic -> flip -> normalize, on JPEG."""
    rng = np.random.RandomState(5)
    img = Image.fromarray(rng.randint(0, 256, (22, 18, 3), np.uint8)).resize(
        (178, 218), Image.BICUBIC)
    data = _jpg(img)
    p = Image.open(io.BytesIO(data)).convert("RGB")
    w, h = p.size
    left, top = int(round((w - 178) / 2.0)), int(round((h - 178) / 2.0))
    ref = _norm(p.crop((left, top, left + 178, top + 178))
                .resize((128, 128), Image.BICUBIC)
                .transpose(Image.FLIP_LEFT_RIGHT))
    got = codec.decode_image(
        data, codec.make_ops(center_crop=178, resize=(128, 128), flip=True),
        (128, 128))
    np.testing.assert_array_equal(got, ref)


def test_resize_and_crop_pipeline_bit_exact():
    """resize 64 -> crop 32 at an offset (the HQ geometry, shrunk)."""
    rng = np.random.RandomState(6)
    arr = rng.randint(0, 256, (90, 70, 3), np.uint8)
    img = Image.fromarray(arr)
    ref = _norm(img.resize((64, 64), Image.BICUBIC).crop((5, 9, 37, 41)))
    got = codec.decode_image(
        _png(arr), codec.make_ops(resize=(64, 64), crop=(5, 9, 32, 32)),
        (32, 32))
    np.testing.assert_array_equal(got, ref)


def test_scaled_decode_quality_bound():
    """The opt-in DCT-scaled path is approximate but close (>35 dB)."""
    rng = np.random.RandomState(7)
    img = Image.fromarray(rng.randint(0, 256, (32, 32, 3), np.uint8)).resize(
        (1024, 1024), Image.BICUBIC)
    data = _jpg(img)
    exact = codec.decode_image(data, codec.make_ops(resize=(256, 256)),
                               (256, 256))
    fast = codec.decode_image(
        data, codec.make_ops(resize=(256, 256), scaled_decode=True),
        (256, 256))
    assert not np.array_equal(fast, exact)  # it IS a different pixel stream
    mse = np.mean((fast - exact) ** 2) * (127.5 ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 35.0, psnr


# ---------------------------------------------------------------------------
# Fallback + error envelope
# ---------------------------------------------------------------------------

def test_unsupported_bytes_fall_back_to_none():
    assert codec.decode_image(b"not an image at all",
                              codec.make_ops(resize=(8, 8)), (8, 8)) is None


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        codec.decode_image("/nonexistent/x.jpg",
                           codec.make_ops(resize=(8, 8)), (8, 8))


def test_out_of_bounds_crop_falls_back():
    rng = np.random.RandomState(8)
    arr = rng.randint(0, 256, (16, 16, 3), np.uint8)
    # crop larger than the resized image -> PIL would pad; native declines
    assert codec.decode_image(
        _png(arr), codec.make_ops(resize=(8, 8), crop=(0, 0, 32, 32)),
        (32, 32)) is None


def test_probe():
    rng = np.random.RandomState(9)
    arr = rng.randint(0, 256, (13, 29, 3), np.uint8)
    assert codec.probe(_png(arr)) == (29, 13)
    assert codec.probe(_jpg(Image.fromarray(arr))) == (29, 13)
    assert codec.probe(b"junk") is None


def test_encode_png_roundtrip():
    rng = np.random.RandomState(10)
    arr = rng.randint(0, 256, (37, 53, 3), np.uint8)
    for level in (1, 6):
        data = codec.encode_png(arr, level=level)
        back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(back, arr)
    gray = rng.randint(0, 20, (17, 19)).astype(np.uint8)
    back = np.asarray(Image.open(io.BytesIO(codec.encode_png(gray, 1))))
    np.testing.assert_array_equal(back, gray)


def test_encode_png_tall_narrow_fits_cap():
    """The output cap must cover PNG's per-row filter byte: a 20000x1
    image has 20000 filter bytes, far beyond a fixed slack (codec.py)."""
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, (20000, 1, 3), np.uint8)
    data = codec.encode_png(arr)
    assert data is not None, "valid encode must not hit the output cap"
    back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(back, arr)


def test_center_crop_origin_matches_python_round():
    """Python's round() is banker's rounding; the crop origin must match it
    bit-exactly for every odd/even margin (transforms.py:69-71).  m=1 and
    m=5 are the cases where lround() would differ (codec.cpp apply_ops)."""
    rng = np.random.RandomState(13)
    cc = 32
    for m_w in range(6):
        for m_h in range(6):
            w, h = cc + m_w, cc + m_h
            arr = rng.randint(0, 256, (h, w, 3), np.uint8)
            img = Image.fromarray(arr)
            left = int(round((w - cc) / 2.0))
            top = int(round((h - cc) / 2.0))
            ref = _norm(img.crop((left, top, left + cc, top + cc)))
            got = codec.decode_image(_png(arr),
                                     codec.make_ops(center_crop=cc), (cc, cc))
            np.testing.assert_array_equal(
                got, ref, err_msg=f"margin w={m_w} h={m_h}")


# ---------------------------------------------------------------------------
# Dataset integration: native on vs off is sample-for-sample identical
# ---------------------------------------------------------------------------

def _disk_dataset(tmp_path, n=4, img_size=256, lab_size=128, fmt="jpg"):
    rng = np.random.RandomState(11)
    imgd, labd = tmp_path / "img", tmp_path / "lab"
    imgd.mkdir(), labd.mkdir()
    for i in range(n):
        img = Image.fromarray(
            rng.randint(0, 256, (16, 16, 3), np.uint8)).resize(
                (img_size, img_size), Image.BICUBIC)
        if fmt == "jpg":
            img.save(imgd / f"{i}.jpg", quality=95)
        else:
            img.save(imgd / f"{i}.png")
        Image.fromarray(
            rng.randint(0, 19, (lab_size, lab_size)).astype(np.uint8)).save(
                labd / f"{i}.png")
    return str(imgd), str(labd)


@pytest.mark.parametrize("preset,cls,fmt", [
    ("8x_independent_256x256", CelebAMaskHQDataset, "jpg"),
    ("8x_independent_128x128", CelebADataset, "png"),
])
def test_dataset_native_matches_pil(tmp_path, preset, cls, fmt):
    exp = get_preset(preset)
    imgd, labd = _disk_dataset(tmp_path, fmt=fmt)

    def make(native_mode):
        d = dataclasses.replace(exp.data, image_dir=imgd, label_dir=labd,
                                native_codec=native_mode)
        ds = cls(dataclasses.replace(exp, data=d), phase="train")
        ds.seed(123)
        return ds

    a, b = make("off"), make("on")
    for i in range(len(a)):
        sa, sb = a[i], b[i]
        # identical rng stream -> identical params -> identical pixels
        np.testing.assert_array_equal(sa["label"], sb["label"])
        np.testing.assert_array_equal(sa["image_hr"], sb["image_hr"])
        assert sb["image_hr"].dtype == np.float32
        assert sb["label"].dtype == np.int32


def test_image_file_helpers_match_pil(tmp_path):
    """demo.py / server seams: image_file_to_array + label_file_to_array."""
    from deepsee_tpu.utils.images import (image_file_to_array, image_to_array,
                                          label_file_to_array, label_to_array)

    rng = np.random.RandomState(13)
    p_img = tmp_path / "img.jpg"
    Image.fromarray(rng.randint(0, 256, (16, 16, 3), np.uint8)).resize(
        (100, 120), Image.BICUBIC).save(p_img, quality=95)
    for size in (64, None):
        ref = image_to_array(Image.open(p_img), size)
        got = image_file_to_array(str(p_img), size)
        np.testing.assert_array_equal(got, ref)
    p_lab = tmp_path / "lab.png"
    lab = rng.randint(0, 19, (80, 80)).astype(np.uint8)
    lab[0, 0] = 255
    Image.fromarray(lab).save(p_lab)
    for size in (64, 80):
        ref = label_to_array(Image.open(p_lab), size, 19)
        got = label_file_to_array(str(p_lab), size, 19)
        np.testing.assert_array_equal(got, ref)


def test_evaluate_folder_load_real_matches_pil(tmp_path):
    import evaluate_folder

    rng = np.random.RandomState(14)
    p = tmp_path / "gt.jpg"
    Image.fromarray(rng.randint(0, 256, (20, 16, 3), np.uint8)).resize(
        (178, 218), Image.BICUBIC).save(p, quality=95)

    def pil_ref(dataset, crop):
        img = Image.open(p).convert("RGB")
        if dataset == "celeba":
            w, h = img.size
            left, top = int(round((w - 178) / 2.0)), int(round((h - 178) / 2.0))
            img = img.crop((left, top, left + 178, top + 178))
        if img.size != (crop, crop):
            img = img.resize((crop, crop), Image.BICUBIC)
        return np.asarray(img, np.float32) / 255.0 * 2.0 - 1.0

    for dataset, crop in (("celeba", 128), ("celebamaskhq", 64)):
        got = evaluate_folder.load_real(str(p), dataset, crop)
        np.testing.assert_array_equal(got, pil_ref(dataset, crop))


def test_server_codecs_match_pil_reference():
    """server.py decode/encode round-trips equal the PIL formulation."""
    import base64

    from deepsee_tpu import server as srv
    from deepsee_tpu.utils.images import image_to_array, label_to_array

    rng = np.random.RandomState(15)
    img = rng.randint(0, 256, (32, 32, 3), np.uint8)
    b64 = base64.b64encode(_png(img)).decode()
    np.testing.assert_array_equal(
        srv.decode_image_b64(b64, 32),
        image_to_array(Image.open(io.BytesIO(_png(img))), 32))
    lab = rng.randint(0, 19, (64, 64)).astype(np.uint8)
    b64 = base64.b64encode(_png(lab)).decode()
    np.testing.assert_array_equal(
        srv.decode_label_b64(b64, 32, 19),
        label_to_array(Image.open(io.BytesIO(_png(lab))), 32, 19))
    # encode: any compress level must decode back to tensor2im pixels
    x = rng.uniform(-1, 1, (24, 24, 3)).astype(np.float32)
    from deepsee_tpu.utils.images import tensor2im
    for level in (1, 6):
        old = srv.PNG_ENCODE_LEVEL
        try:
            srv.PNG_ENCODE_LEVEL = level
            data = base64.b64decode(srv.encode_image_b64(x))
        finally:
            srv.PNG_ENCODE_LEVEL = old
        back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(back, tensor2im(x))


def test_native_on_without_library(monkeypatch):
    monkeypatch.setattr(native, "available", lambda **kw: False)
    exp = get_preset("8x_independent_256x256")
    d = dataclasses.replace(exp.data, native_codec="on")
    with pytest.raises(RuntimeError, match="native_codec"):
        transforms.load_image("x.jpg", d, exp.model,
                              transforms.TransformParams((0, 0), False), True)


def test_unsupported_mode_falls_back_to_pil(tmp_path):
    """scale_width depends on the decoded size -> native plan is None."""
    exp = get_preset("8x_independent_256x256")
    d = dataclasses.replace(exp.data,
                            preprocess_mode="scale_width_and_crop",
                            native_codec="on")
    assert transforms._native_plan(d, exp.model,
                                   transforms.TransformParams((0, 0), False),
                                   True, False, None) is None
    rng = np.random.RandomState(12)
    arr = rng.randint(0, 256, (96, 64, 3), np.uint8)
    p = tmp_path / "a.png"
    Image.fromarray(arr).save(p)
    lib_arr = transforms.load_image(str(p), d, exp.model,
                                    transforms.TransformParams((0, 0), False),
                                    is_train=False)
    ref = transforms.apply_image_transform(
        Image.open(p), d, exp.model, transforms.TransformParams((0, 0), False),
        is_train=False)
    np.testing.assert_array_equal(lib_arr, ref)


# ---------------------------------------------------------------------------
# Hardening: adversarial corpus + hostile ops (round-5; fuzzed under
# ASAN+UBSAN by scripts/fuzz_codec.py, these pin the guard behavior)
# ---------------------------------------------------------------------------

CORPUS = os.path.join(os.path.dirname(__file__), "data", "codec_corpus")


@pytest.mark.parametrize("name", sorted(os.listdir(CORPUS)))
def test_adversarial_corpus_never_crashes(name):
    """Every checked-in adversarial input must come back as a clean PIL
    fallback (None) from every byte entry point — the serving daemon feeds
    these functions untrusted HTTP bytes (server.py -> utils/images.py)."""
    with open(os.path.join(CORPUS, name), "rb") as f:
        data = f.read()
    ops = codec.make_ops(resize=(32, 32))
    assert codec.decode_image(data, ops, (32, 32)) is None
    assert codec.decode_u8(data, ops, (32, 32)) is None
    assert codec.decode_label(data, ops, (32, 32), 18) is None
    codec.probe(data)  # any result, as long as it returns


def test_bomb_png_rejected_before_allocation():
    """A valid PNG declaring 100000x100000 must be refused (UNSUPPORTED ->
    PIL fallback with its own bomb policy), not allocated."""
    with open(os.path.join(CORPUS, "png_bomb_ihdr.bin"), "rb") as f:
        data = f.read()
    assert codec.decode_image(data, codec.make_ops(), (100000, 100000)) is None
    # probe also refuses to report absurd dims from a raw IHDR
    assert codec.probe(data) is None


def test_hostile_ops_rejected():
    rng = np.random.RandomState(13)
    data = _png(rng.randint(0, 256, (16, 16, 3), np.uint8))
    imax = 2**31 - 1
    # zero/negative resize_h; overflowing crop; negative crop_h
    for ops in [
        codec.make_ops(resize=(8, 0)),
        codec.make_ops(resize=(8, -4)),
        codec.make_ops(resize=(8, 8), crop=(imax, 0, imax, 8)),
        codec.make_ops(resize=(8, 8), crop=(0, 0, 4, -1)),
    ]:
        assert codec.decode_u8(data, ops, (8, 8)) is None


def test_selfcheck_gates_load(monkeypatch):
    """load() runs a one-shot JPEG parity probe vs PIL; on this host's
    libjpeg it must pass (the .so is in use), and the skip env var works."""
    lib = native.load()
    assert lib is not None
    assert native._selfcheck(lib)
    monkeypatch.setenv("DEEPSEE_NATIVE_NO_SELFCHECK", "1")
    assert native._selfcheck(lib)
