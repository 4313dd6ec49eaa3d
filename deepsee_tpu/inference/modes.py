"""Explorative inference toolbox.

The reference exposes these as modes of SRModel.forward (sr_model.py:64-446);
here each is a pure function over (system, variables, preprocessed batch,
PRNG key).  They are all data-space manipulations of the (B, 19, S) style
matrix around one generator call:

  inference_noise                  random style variants        (:116-129)
  inference_multi_modal            per-region random perturbation (:130-167)
  inference_replace_semantics      relabel region 10 -> 12       (:168-197)
  inference_reference_semantics    swap semantic maps in batch   (:198-218)
  inference_interpolation          +/- delta walk on style rows  (:219-261)
  inference_interpolation_style    lerp between two styles       (:262-297)
  inference_particular_combined    mini-encoder styles (+noise)  (:298-346)
  inference_particular_full        HR-encoder styles             (:347-380)
  inference_reference              cross-batch style transplant  (:381-410)
  inference_reference_interpolation lerp toward scaled reference (:411-444)
  baseline_upscale                 bicubic baseline              (:109-115)
  encode_only / generate_with_style                              (:92-108)

TPU-first shape: the reference loops n (or B) eager generator calls per mode;
here every mode builds its full style stack with vectorized ops and makes ONE
jitted generator call over a (B*n)-batch (`generate_with_styles`), so the
device sees a single large compiled program instead of n round trips — on the
axon tunnel (~38 ms RTT/call) this is the difference between n RTTs + n eager
dispatches and one.

Region symmetry: CONSISTENT_REGIONS (left eye/brow/ear, upper lip) are tied
to their partner region when perturbing (sr_model.py:134,153).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepsee_tpu.regions import CONSISTENT_REGIONS
from deepsee_tpu.ops.resize import resize2d
from deepsee_tpu.system import SRSystem

# batch keys the generator/encoder consume (everything else — paths, ids —
# stays on host)
_GEN_KEYS = ("image_lr", "input_semantics")
_ENC_KEYS = _GEN_KEYS + ("image_hr", "guiding_image", "guiding_label")


def _region_indices(system: SRSystem, region_idx) -> np.ndarray:
    if region_idx is None:
        region_idx = system.exp.region_idx
    if region_idx is None:
        region_idx = range(system.cfg.semantic_nc)
    return np.asarray(list(region_idx), np.int32)


def get_noise(key: jax.Array, shape, delta: float,
              dist: str = "normal") -> jnp.ndarray:
    """sr_model.py:448-457: clamp(draw, -1, 1) * delta."""
    if dist == "normal":
        noise = jnp.clip(jax.random.normal(key, shape), -1, 1) * delta
    elif dist == "uniform":
        noise = jnp.clip(jax.random.uniform(key, shape), -1, 1) * delta
    else:
        raise ValueError(f"Invalid noise distribution: {dist}")
    return noise


def corrupt_style(key: jax.Array, style: jnp.ndarray, eps: float = 0.05,
                  dist: str = "gaussian") -> jnp.ndarray:
    """sr_model.py:459-467: additive style corruption with variance eps."""
    scale = float(np.sqrt(eps))
    if dist == "gaussian":
        return jax.random.normal(key, style.shape) * scale + style
    if dist == "uniform":
        return (jax.random.uniform(key, style.shape) * 2 - 1) * scale * 1.4 + style
    raise ValueError(dist)


def _tie_consistent(style: jnp.ndarray) -> jnp.ndarray:
    """style[..., r, :] = style[..., r+1, :] for the symmetric regions."""
    idx = np.asarray(CONSISTENT_REGIONS)
    return style.at[..., idx, :].set(style[..., idx + 1, :])


def _arrays(batch: Dict, keys=_ENC_KEYS) -> Dict:
    # duck-typed: numpy arrays straight from the DataLoader collate must
    # not be silently dropped (a missing optional key like image_hr would
    # send the encoder to its zeros-HR fallback with no error)
    return {k: jnp.asarray(v) for k, v in batch.items()
            if k in keys and hasattr(v, "shape")}


def encode_only(system: SRSystem, variables, batch, *,
                encode_full: Optional[bool] = None) -> jnp.ndarray:
    """sr_model.py:92-99: the style matrix alone; no noise (jitted)."""
    if encode_full is None:
        encode_full = system.cfg.full_style_image
    return system.encode_jit(variables.e, _arrays(batch), encode_full, True)


def generate_with_style(system: SRSystem, variables, batch,
                        style: jnp.ndarray) -> jnp.ndarray:
    """'demo' mode (sr_model.py:100-108): direct jitted netSR call."""
    fake, _ = system.generate_jit(variables.g, None, _arrays(batch, _GEN_KEYS),
                                  style, True, True, None)
    return fake


def generate_with_styles(system: SRSystem, variables, batch,
                         styles: jnp.ndarray) -> jnp.ndarray:
    """styles (B, n, 19, S) -> fakes (B, n, H, W, 3) in ONE jitted call.

    The (B, n) grid flattens to a (B*n)-batch: inputs repeat n-consecutive
    (jnp.repeat) so flat index i*n+j is (sample i, style j), matching the
    row-major styles reshape."""
    b, n = styles.shape[:2]
    rep = {k: jnp.repeat(v, n, axis=0)
           for k, v in _arrays(batch, _GEN_KEYS).items()}
    flat = styles.reshape((b * n,) + styles.shape[2:])
    fake, _ = system.generate_jit(variables.g, None, rep, flat, True, True,
                                  None)
    return fake.reshape((b, n) + fake.shape[1:])


def baseline_upscale(system: SRSystem, batch) -> jnp.ndarray:
    """Bicubic baseline (sr_model.py:109-115)."""
    cfg = system.cfg
    up = resize2d(batch["image_lr"], (cfg.crop_size, cfg.crop_size),
                  method="bicubic")
    return jnp.clip(up, -1.0, 1.0)


def inference_noise(system: SRSystem, variables, batch, key: jax.Array,
                    n: Optional[int] = None) -> jnp.ndarray:
    """sr_model.py:116-129: n random-style variants per input.

    Returns (B, n, H, W, 3).  The reference's eval-time encode takes the
    mini path with a 50% style-noise coin per call (sr_model.py:641-644).
    One jitted call over the (B*n)-batch; encoder noise differs per variant
    because each repeat draws its own noise."""
    b = batch["image_lr"].shape[0]
    n = n or b
    rep = {k: jnp.repeat(v, n, axis=0) for k, v in _arrays(batch).items()}
    k_coin, k_noise = jax.random.split(key)
    no_noise = jax.random.bernoulli(k_coin, 0.5)
    fake = system.generate_coin_jit(variables.g, variables.e, rep, no_noise,
                                    {"noise": k_noise})
    return fake.reshape((b, n) + fake.shape[1:])


def inference_multi_modal(system: SRSystem, variables, batch, key: jax.Array,
                          n: Optional[int] = None,
                          region_idx: Optional[Sequence[int]] = None,
                          delta: Optional[float] = None):
    """sr_model.py:130-167: n per-region random perturbations of the encoded
    style, symmetric regions tied.  Returns (fakes (B,n,H,W,3), styles)."""
    exp = system.exp
    n = n or exp.n_interpolation
    delta = exp.noise_delta if delta is None else delta
    ridx = _region_indices(system, region_idx)

    style = encode_only(system, variables, batch)
    b, nc, s = style.shape

    noise = get_noise(key, (b, n, len(ridx), s), delta, exp.noise_dist)
    styles = jnp.broadcast_to(style[:, None], (b, n, nc, s))
    styles = styles.at[:, :, ridx].set(
        jnp.clip(style[:, None, ridx] + noise, -1.0, 1.0))
    styles = _tie_consistent(styles)
    return generate_with_styles(system, variables, batch, styles), styles


def inference_replace_semantics(system: SRSystem, variables, batch,
                                regions_replace: Sequence[int] = (10,),
                                new_region_idx: int = 12):
    """sr_model.py:168-197 (fixed — the reference's version calls an
    undefined method): generate, relabel regions, regenerate.  Both the
    original and relabeled passes run as ONE 2B-batch jitted call."""
    label = batch["label"]
    relabeled = label
    for rp in regions_replace:
        relabeled = jnp.where(relabeled == rp, new_region_idx, relabeled)

    big = {k: jnp.concatenate([v, v], axis=0)
           for k, v in _arrays(batch).items() if k != "input_semantics"}
    big["label"] = jnp.concatenate([label, relabeled], axis=0)
    big = system.preprocess_jit(big)
    fake, _ = system.generate_jit(variables.g, variables.e, _arrays(big),
                                  None, system.cfg.full_style_image, True,
                                  None)
    b = label.shape[0]
    return fake[:b], fake[b:]


def inference_reference_semantics(system: SRSystem, variables, batch):
    """sr_model.py:198-218: each output b uses sample b_sem's semantics.
    Returns (B, B, H, W, 3) — the full (image i, semantics j) grid in one
    jitted B*B-batch call."""
    ab = _arrays(batch)
    sem = ab.pop("input_semantics")
    b = sem.shape[0]
    rep = {k: jnp.repeat(v, b, axis=0) for k, v in ab.items()}
    rep["input_semantics"] = jnp.tile(sem, (b,) + (1,) * (sem.ndim - 1))
    fake, _ = system.generate_jit(variables.g, variables.e, rep, None,
                                  system.cfg.full_style_image, True, None)
    return fake.reshape((b, b) + fake.shape[1:])


def inference_interpolation(system: SRSystem, variables, batch,
                            style: Optional[jnp.ndarray] = None,
                            n: Optional[int] = None,
                            delta: Optional[float] = None,
                            region_idx: Optional[Sequence[int]] = None):
    """sr_model.py:219-261: walk style rows by linspace(-delta, +delta)."""
    exp = system.exp
    n = n or exp.n_interpolation
    assert n % 2 == 1, "odd n so the middle image has delta=0 (sr_model.py:228)"
    delta = exp.noise_delta if delta is None else delta
    ridx = _region_indices(system, region_idx)

    if style is None:
        style = encode_only(system, variables, batch)
    b, nc, s = style.shape

    steps = jnp.linspace(-delta, delta, num=n)
    styles = jnp.broadcast_to(style[:, None], (b, n, nc, s))
    styles = styles.at[:, :, ridx].set(jnp.clip(
        style[:, None, ridx] + steps[None, :, None, None], -1.0, 1.0))
    return generate_with_styles(system, variables, batch, styles), styles


def inference_interpolation_style(system: SRSystem, variables, batch,
                                  style_from: jnp.ndarray,
                                  style_to: jnp.ndarray,
                                  n: Optional[int] = None):
    """sr_model.py:262-297: lerp between two style matrices."""
    n = n or system.exp.n_interpolation
    assert n % 2 == 1
    ts = jnp.linspace(0.0, 1.0, num=n)[None, :, None, None]
    styles = (1.0 - ts) * style_from[:, None] + ts * style_to[:, None]
    return generate_with_styles(system, variables, batch, styles), styles


def inference_particular_combined(system: SRSystem, variables, batch,
                                  key: jax.Array,
                                  region_idx: Optional[Sequence[int]] = None):
    """sr_model.py:298-346: mini-encoded style, optionally noise-perturbed
    on selected regions with symmetric regions tied."""
    exp = system.exp
    style = system.encode_jit(variables.e, _arrays(batch), False, True)
    if exp.noise_delta > 0:
        ridx = _region_indices(system, region_idx)
        noise = get_noise(key, (style.shape[0], len(ridx), style.shape[-1]),
                          exp.noise_delta, exp.noise_dist)
        style = style.at[:, ridx].set(
            jnp.clip(style[:, ridx] + noise, -1.0, 1.0))
        style = _tie_consistent(style)
    return generate_with_style(system, variables, batch, style), style


def inference_particular_full(system: SRSystem, variables, batch):
    """sr_model.py:347-380: HR-encoded style; plus the guiding-image variant
    when configured.  Returns dict of images."""
    out = {}
    arrays = _arrays(batch)
    # "original" = style from the GT HR image: exclude the guiding keys so
    # encoder_inputs (system.py:125-126) picks image_hr, not the guiding
    # image (sr_model.py:347-361 vs :362-380)
    base = {k: v for k, v in arrays.items()
            if k not in ("guiding_image", "guiding_label")}
    style_full = system.encode_jit(variables.e, base, True, True)
    out["fake_image_original"] = generate_with_style(system, variables, batch,
                                                     style_full)
    if system.cfg.guiding_style_image and "guiding_image" in batch:
        out["fake_image_guiding"] = generate_with_style(
            system, variables, batch,
            system.encode_jit(variables.e, arrays, True, True))
    return out


def inference_reference(system: SRSystem, variables, batch,
                        region_idx: Optional[Sequence[int]] = None):
    """sr_model.py:381-410: for each sample b, splice every other sample's
    style rows (selected regions) into b's style.  Returns (B,B,H,W,3):
    grid[i, j] = recipient i with donor j's rows, one jitted call."""
    ridx = _region_indices(system, region_idx)
    style_full = system.encode_jit(variables.e, _arrays(batch), True, True)
    b, nc, s = style_full.shape

    donors = jnp.clip(style_full[:, ridx], -1.0, 1.0)       # (B_donor, R, S)
    styles = jnp.broadcast_to(style_full[:, None], (b, b, nc, s))
    styles = styles.at[:, :, ridx].set(
        jnp.broadcast_to(donors[None], (b, b, len(ridx), s)))
    return generate_with_styles(system, variables, batch, styles)


def inference_reference_interpolation(system: SRSystem, variables, batch,
                                      n: Optional[int] = None,
                                      region_idx: Optional[Sequence[int]] = None,
                                      manipulate_scale: Optional[float] = None):
    """sr_model.py:411-444: lerp each sample's style toward the next
    sample's (scaled) style.  Returns (B, n, H, W, 3)."""
    exp = system.exp
    n = n or exp.n_interpolation
    scale = (exp.manipulate_scale if manipulate_scale is None
             else manipulate_scale)
    ridx = _region_indices(system, region_idx)

    style_full = system.encode_jit(variables.e, _arrays(batch), True, True)
    b, nc, s = style_full.shape
    target = jnp.roll(style_full, shift=-1, axis=0) * scale

    ts = jnp.linspace(0.0, 1.0, num=n)[None, :, None, None]
    walk = jnp.clip((1.0 - ts) * style_full[:, None, ridx]
                    + ts * target[:, None, ridx], -1.0, 1.0)
    styles = jnp.broadcast_to(style_full[:, None], (b, n, nc, s))
    styles = styles.at[:, :, ridx].set(walk)
    return generate_with_styles(system, variables, batch, styles)
