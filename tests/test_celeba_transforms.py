"""CelebA 128-squared preset transform parity (VERDICT round-1 item 2).

The reference's CelebADataset sets preprocess_mode='center_crop_and_resize'
with center_crop_size=178 (data/celeba_dataset.py:37-43): images are cropped
to the 178px face region of the native 178x218 CelebA frame BEFORE resizing
to 128, while labels (predicted on square images) use plain 'resize'
(celeba_dataset.py:52-55).

torchvision is not installed in this environment, so the expected pipeline is
replicated in-test directly on PIL (torchvision's CenterCrop/Resize/ToTensor/
Normalize are thin PIL/numpy wrappers; semantics cited per-step below) and
compared bit-for-bit against deepsee_tpu's apply_image_transform /
apply_label_transform for the celeba preset.
"""

import dataclasses
import os

import numpy as np
from PIL import Image

from deepsee_tpu.config import get_preset
from deepsee_tpu.data import (TransformParams, apply_image_transform,
                              apply_label_transform, create_dataset)


def _celeba_exp():
    return get_preset("8x_independent_128x128")


def _ref_image_pipeline(img: Image.Image, params: TransformParams,
                        is_train: bool, no_flip: bool) -> np.ndarray:
    """Reference get_transform for mode 'center_crop_and_resize'
    (data/base_dataset.py:171-201) with torchvision ops inlined:

      CenterCrop(178): crop_top/left = int(round((size - 178) / 2))
        [torchvision.transforms.functional.center_crop]
      Resize((128,128), BICUBIC): PIL img.resize
      __flip when isTrain and not no_flip and params['flip']
      ToTensor + Normalize((0.5,)*3, (0.5,)*3): uint8/255 -> *2-1
    """
    img = img.convert("RGB")
    w, h = img.size
    cc = 178
    left = int(round((w - cc) / 2.0))
    top = int(round((h - cc) / 2.0))
    img = img.crop((left, top, left + cc, top + cc))
    img = img.resize((128, 128), Image.BICUBIC)
    if is_train and not no_flip and params.flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0


def _ref_label_pipeline(lab: Image.Image, params: TransformParams,
                        is_train: bool, no_flip: bool,
                        label_nc: int) -> np.ndarray:
    """Reference label path: preprocess_mode forced to 'resize'
    (celeba_dataset.py:52-55) -> NEAREST resize only (no center crop),
    *255 then 255 -> label_nc (base_dataset.py:93-95)."""
    lab = lab.resize((128, 128), Image.NEAREST)
    if is_train and not no_flip and params.flip:
        lab = lab.transpose(Image.FLIP_LEFT_RIGHT)
    arr = np.asarray(lab).astype(np.int32)
    if arr.ndim == 3:
        arr = arr[..., 0]
    arr[arr == 255] = label_nc
    return arr


def _synthetic_celeba_frame(seed=0):
    """A 178x218 image like the native CelebA aligned frame."""
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 255, (218, 178, 3), dtype=np.uint8))


def test_preset_uses_center_crop():
    exp = _celeba_exp()
    assert exp.data.preprocess_mode == "center_crop_and_resize"
    assert exp.data.center_crop_size == 178
    assert exp.data.dataset == "celeba"
    assert exp.model.load_size == 128 and exp.model.crop_size == 128


def test_celeba_image_transform_parity():
    exp = _celeba_exp()
    img = _synthetic_celeba_frame()
    for flip in (False, True):
        params = TransformParams(crop_pos=(0, 0), flip=flip)
        got = apply_image_transform(img, exp.data, exp.model, params,
                                    is_train=True)
        want = _ref_image_pipeline(img, params, is_train=True, no_flip=False)
        np.testing.assert_array_equal(got, want)
    # the crop actually fires: differs from a no-crop resize of the full frame
    params = TransformParams(crop_pos=(0, 0), flip=False)
    got = apply_image_transform(img, exp.data, exp.model, params,
                                is_train=True)
    nocrop = np.asarray(img.convert("RGB").resize((128, 128), Image.BICUBIC),
                        dtype=np.float32) / 255.0 * 2.0 - 1.0
    assert np.abs(got - nocrop).max() > 0.01


def test_celeba_label_transform_parity():
    exp = _celeba_exp()
    rng = np.random.RandomState(1)
    lab_arr = rng.randint(0, 19, (218, 178), dtype=np.uint8)
    lab_arr[0, 0] = 255  # 'unknown'
    lab = Image.fromarray(lab_arr)
    for flip in (False, True):
        params = TransformParams(crop_pos=(0, 0), flip=flip)
        # labels go through 'resize' only, as CelebADataset overrides
        got = apply_label_transform(lab, exp.data, exp.model, params,
                                    is_train=True, preprocess_mode="resize")
        want = _ref_label_pipeline(lab, params, is_train=True, no_flip=False,
                                   label_nc=exp.model.label_nc)
        np.testing.assert_array_equal(got, want)


def test_celeba_dataset_end_to_end(tmp_path):
    """Fake 178x218 CelebA on disk through CelebADataset: image is
    center-cropped, label is not."""
    img_dir = os.path.join(str(tmp_path), "img")
    lab_dir = os.path.join(str(tmp_path), "lab")
    os.makedirs(img_dir), os.makedirs(lab_dir)
    rng = np.random.RandomState(2)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (218, 178, 3), dtype=np.uint8)
                        ).save(os.path.join(img_dir, f"{i}.png"))
        Image.fromarray(rng.randint(0, 19, (218, 178), dtype=np.uint8)
                        ).save(os.path.join(lab_dir, f"{i}.png"))
    exp = _celeba_exp()
    exp = exp.replace(data=dataclasses.replace(
        exp.data, image_dir=img_dir, label_dir=lab_dir, no_flip=True))
    ds = create_dataset(exp, phase="val")
    s = ds[0]
    assert s["image_hr"].shape == (128, 128, 3)
    assert s["label"].shape == (128, 128)
    img = Image.open(os.path.join(img_dir, "0.png"))
    lab = Image.open(os.path.join(lab_dir, "0.png"))
    params = TransformParams(crop_pos=(0, 0), flip=False)
    np.testing.assert_array_equal(
        s["image_hr"],
        _ref_image_pipeline(img, params, is_train=False, no_flip=True))
    np.testing.assert_array_equal(
        s["label"],
        _ref_label_pipeline(lab, params, is_train=False, no_flip=True,
                            label_nc=19))
