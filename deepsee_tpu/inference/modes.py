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
    """style[:, r] = style[:, r+1] for the symmetric regions."""
    idx = np.asarray(CONSISTENT_REGIONS)
    return style.at[:, idx].set(style[:, idx + 1])


def encode_only(system: SRSystem, variables, batch, *,
                encode_full: Optional[bool] = None) -> jnp.ndarray:
    """sr_model.py:92-99: the style matrix alone; no noise."""
    if encode_full is None:
        encode_full = system.cfg.full_style_image
    return system.encode_style(variables.e, batch, use_full=encode_full,
                               no_noise=True, train=False)


def generate_with_style(system: SRSystem, variables, batch,
                        style: jnp.ndarray) -> jnp.ndarray:
    """'demo' mode (sr_model.py:100-108): direct netSR call."""
    fake, _, _ = system.generate(variables.g, None, batch, style=style,
                                 train=False)
    return fake


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
    mini path with a 50% style-noise coin per call (sr_model.py:641-644)."""
    b = batch["image_lr"].shape[0]
    n = n or b
    rep = {k: jnp.repeat(v, n, axis=0) for k, v in batch.items()
           if isinstance(v, jnp.ndarray)}
    k_coin, k_noise = jax.random.split(key)
    no_noise = jax.random.bernoulli(k_coin, 0.5)
    fake, _, _ = system.generate(
        variables.g, variables.e, rep, use_full=False, no_noise=no_noise,
        train=False, rngs={"noise": k_noise})
    h, w = fake.shape[1:3]
    return fake.reshape(b, n, h, w, 3)


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
    b = style.shape[0]

    keys = jax.random.split(key, n)
    fakes, styles = [], []
    for i in range(n):
        noise = get_noise(keys[i], (b, len(ridx), style.shape[-1]), delta,
                          exp.noise_dist)
        s = style.at[:, ridx].set(
            jnp.clip(style[:, ridx] + noise, -1.0, 1.0))
        s = _tie_consistent(s)
        fakes.append(generate_with_style(system, variables, batch, s))
        styles.append(s)
    return jnp.stack(fakes, axis=1), jnp.stack(styles, axis=1)


def inference_replace_semantics(system: SRSystem, variables, batch,
                                regions_replace: Sequence[int] = (10,),
                                new_region_idx: int = 12):
    """sr_model.py:168-197 (fixed — the reference's version calls an
    undefined method): generate, relabel regions, regenerate."""
    fake_before, _, _ = system.generate(variables.g, variables.e, batch,
                                        use_full=system.cfg.full_style_image,
                                        no_noise=True, train=False)
    label = batch["label"]
    for rp in regions_replace:
        label = jnp.where(label == rp, new_region_idx, label)
    new_batch = dict(batch)
    new_batch["label"] = label
    new_batch.pop("input_semantics", None)
    new_batch = system.preprocess(new_batch)
    fake_after, _, _ = system.generate(variables.g, variables.e, new_batch,
                                       use_full=system.cfg.full_style_image,
                                       no_noise=True, train=False)
    return fake_before, fake_after


def inference_reference_semantics(system: SRSystem, variables, batch):
    """sr_model.py:198-218: each output b uses sample b_sem's semantics.
    Returns (B, B, H, W, 3): outputs for every (image, semantics) pair."""
    sem = batch["input_semantics"]
    b = sem.shape[0]
    outs = []
    for b_sem in range(b):
        cur = dict(batch)
        cur["input_semantics"] = jnp.broadcast_to(sem[b_sem:b_sem + 1],
                                                  sem.shape)
        fake, _, _ = system.generate(variables.g, variables.e, cur,
                                     use_full=system.cfg.full_style_image,
                                     no_noise=True, train=False)
        outs.append(fake)
    return jnp.stack(outs, axis=1)


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

    fakes, styles = [], []
    for step in np.linspace(-delta, delta, num=n):
        s = style.at[:, ridx].set(jnp.clip(style[:, ridx] + step, -1.0, 1.0))
        fakes.append(generate_with_style(system, variables, batch, s))
        styles.append(s)
    return jnp.stack(fakes, axis=1), jnp.stack(styles, axis=1)


def inference_interpolation_style(system: SRSystem, variables, batch,
                                  style_from: jnp.ndarray,
                                  style_to: jnp.ndarray,
                                  n: Optional[int] = None):
    """sr_model.py:262-297: lerp between two style matrices."""
    n = n or system.exp.n_interpolation
    assert n % 2 == 1
    fakes, styles = [], []
    for t in np.linspace(0.0, 1.0, num=n):
        s = (1.0 - t) * style_from + t * style_to
        fakes.append(generate_with_style(system, variables, batch, s))
        styles.append(s)
    return jnp.stack(fakes, axis=1), jnp.stack(styles, axis=1)


def inference_particular_combined(system: SRSystem, variables, batch,
                                  key: jax.Array,
                                  region_idx: Optional[Sequence[int]] = None):
    """sr_model.py:298-346: mini-encoded style, optionally noise-perturbed
    on selected regions with symmetric regions tied."""
    exp = system.exp
    style = system.encode_style(variables.e, batch, use_full=False,
                                no_noise=True, train=False)
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
    style_full = system.encode_style(variables.e, batch, use_full=True,
                                     no_noise=True, train=False)
    out["fake_image_original"] = generate_with_style(system, variables, batch,
                                                     style_full)
    if system.cfg.guiding_style_image and "guiding_image" in batch:
        gbatch = dict(batch)
        out["fake_image_guiding"] = generate_with_style(
            system, variables, batch,
            system.encode_style(variables.e, gbatch, use_full=True,
                                no_noise=True, train=False))
    return out


def inference_reference(system: SRSystem, variables, batch,
                        region_idx: Optional[Sequence[int]] = None):
    """sr_model.py:381-410: for each sample b, splice every other sample's
    style rows (selected regions) into b's style.  Returns (B,B,H,W,3)."""
    ridx = _region_indices(system, region_idx)
    style_full = system.encode_style(variables.e, batch, use_full=True,
                                     no_noise=True, train=False)
    b = style_full.shape[0]
    # one batched generate per donor j: every sample i gets j's rows spliced
    # into its own style (B generator calls for the full B x B grid)
    cols = []
    for j in range(b):
        donor = jnp.broadcast_to(style_full[j:j + 1, ridx],
                                 (b,) + style_full[0, ridx].shape)
        s = style_full.at[:, ridx].set(jnp.clip(donor, -1.0, 1.0))
        cols.append(generate_with_style(system, variables, batch, s))
    return jnp.stack(cols, axis=1)  # (B, B, H, W, 3): [recipient, donor]


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

    style_full = system.encode_style(variables.e, batch, use_full=True,
                                     no_noise=True, train=False)
    b = style_full.shape[0]
    target = jnp.roll(style_full, shift=-1, axis=0) * scale

    fakes = []
    for t in np.linspace(0.0, 1.0, num=n):
        s = style_full.at[:, ridx].set(jnp.clip(
            (1.0 - t) * style_full[:, ridx] + t * target[:, ridx], -1.0, 1.0))
        fakes.append(generate_with_style(system, variables, batch, s))
    return jnp.stack(fakes, axis=1)
