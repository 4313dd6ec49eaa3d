"""AOT serving export: serialize the jitted inference program.

TPU-native generalization of the reference's deployment story (demo.py:92-131
loads `<epoch>_net_*.pth` files and re-runs eager torch).  Here the WHOLE
inference computation — on-device preprocessing (one-hot semantics, no
host work but image decode), style encode, generator forward — is exported
once with `jax.export` as a self-contained StableHLO artifact with the
weights baked in as constants.  A serving process deserializes and calls it
with zero framework code (no SRSystem, no flax, no config), and the program
is portable across JAX versions per the jax.export compatibility guarantees.

Two programs per model:
  * end-to-end: (image_lr, label[, guiding_image, guiding_label]) -> (fake,
    style) — the standard serving path; style is returned so callers can
    save/perturb it.
  * styled: (image_lr, label, style) -> fake — the manipulation serving
    path (splice/interpolate style matrices host-side, re-render).

Entry points: `make_serving_fns`, `export_serving`, `load_serving`, and the
`scripts/export_serving.py` CLI.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from deepsee_tpu.config import Experiment
from deepsee_tpu.system import SRSystem, SystemVariables


def make_serving_fns(system: SRSystem, variables: SystemVariables
                     ) -> Tuple[Callable, Callable]:
    """Build the two pure serving functions with weights closed over.

    For guided models (cfg.guiding_style_image) the end-to-end fn takes the
    guiding HR image + its label map as extra args (sr_model.py:601-626:
    the guided model always encodes a full HR image)."""
    cfg = system.cfg
    g, e = variables.g, variables.e
    guided = cfg.guiding_style_image

    if guided:
        def end_to_end(image_lr, label, guiding_image, guiding_label):
            pre = system.preprocess({
                "image_lr": image_lr, "label": label,
                "guiding_image": guiding_image,
                "guiding_label": guiding_label})
            fake, style, _ = system.generate(
                g, e, pre, use_full=True, no_noise=True, train=False)
            return fake, style
    else:
        def end_to_end(image_lr, label):
            pre = system.preprocess({"image_lr": image_lr, "label": label})
            fake, style, _ = system.generate(
                g, e, pre, use_full=False, no_noise=True, train=False)
            return fake, style

    def styled(image_lr, label, style):
        pre = system.preprocess({"image_lr": image_lr, "label": label})
        fake, _, _ = system.generate(
            g, None, pre, style=style, no_noise=True, train=False)
        return fake

    return end_to_end, styled


def serving_arg_specs(exp: Experiment, batch_size: int = 1):
    """ShapeDtypeStructs for the two programs' arguments."""
    cfg = exp.model
    lr = jax.ShapeDtypeStruct(
        (batch_size, cfg.start_size, cfg.start_size, 3), jnp.float32)
    lab = jax.ShapeDtypeStruct(
        (batch_size, cfg.crop_size, cfg.crop_size), jnp.int32)
    sty = jax.ShapeDtypeStruct(
        (batch_size, cfg.label_nc, cfg.regional_style_size), jnp.float32)
    if cfg.guiding_style_image:
        hr = jax.ShapeDtypeStruct(
            (batch_size, cfg.crop_size, cfg.crop_size, 3), jnp.float32)
        e2e_args = (lr, lab, hr, lab)
    else:
        e2e_args = (lr, lab)
    return e2e_args, (lr, lab, sty)


def export_serving(exp: Experiment, variables: SystemVariables,
                   batch_size: int = 1,
                   platforms: Sequence[str] = ("tpu",),
                   quantize: str = "",
                   ) -> Dict[str, bytes]:
    """Export both serving programs; returns {name: serialized bytes}.

    quantize="int8": trace under layers.int8_inference — wide convs run
    W8A8 on the s8 MXU path (1.40x end-to-end on v5e, SmoothQuant
    equalization on).  "int8_nosmooth" drops the equalization: ~4% faster,
    -1.2 dB parity, and the weight quantization becomes input-independent
    so it constant-folds against the baked-in weights at the serving
    compile."""
    import contextlib

    from deepsee_tpu.models.layers import int8_inference

    system = SRSystem(exp.replace(is_train=False))
    end_to_end, styled = make_serving_fns(system, variables)
    e2e_args, styled_args = serving_arg_specs(exp, batch_size)
    plats = list(platforms)
    if quantize not in ("", "int8", "int8_nosmooth"):
        raise ValueError(f"unknown quantize mode {quantize!r}")
    ctx = (int8_inference(smooth=(quantize == "int8"))
           if quantize.startswith("int8") else contextlib.nullcontext())
    out = {}
    with ctx:
        out["end_to_end"] = jax_export.export(
            jax.jit(end_to_end), platforms=plats)(*e2e_args).serialize()
        out["styled"] = jax_export.export(
            jax.jit(styled), platforms=plats)(*styled_args).serialize()
    return out


def save_serving(out_dir: str, exp: Experiment, blobs: Dict[str, bytes],
                 batch_size: int, platforms: Sequence[str],
                 quantize: str = "") -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, blob in blobs.items():
        with open(os.path.join(out_dir, f"{name}.jaxexport"), "wb") as f:
            f.write(blob)
    cfg = exp.model
    manifest = {
        "name": exp.name, "batch_size": batch_size,
        "platforms": list(platforms),
        "quantize": quantize,
        "start_size": cfg.start_size, "crop_size": cfg.crop_size,
        "label_nc": cfg.label_nc,
        "regional_style_size": cfg.regional_style_size,
        "guiding_style_image": cfg.guiding_style_image,
        "programs": {
            "end_to_end": "(image_lr, label"
                          + (", guiding_image, guiding_label"
                             if cfg.guiding_style_image else "")
                          + ") -> (fake, style)",
            "styled": "(image_lr, label, style) -> fake",
        },
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)


def load_serving(path_or_dir: str, name: str = "end_to_end") -> Callable:
    """Deserialize an exported program; returns a plain callable."""
    path = path_or_dir
    if os.path.isdir(path):
        path = os.path.join(path, f"{name}.jaxexport")
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call
