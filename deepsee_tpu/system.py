"""SRSystem — the model facade.

Replaces the reference's `SRModel` (deepsee_models/sr_model.py): instead of a
mode-switch mega-forward behind DataParallel, this bundles the network
definitions with pure functions over explicit variable pytrees.  Training
steps live in deepsee_tpu/train, the explorative inference toolbox in
deepsee_tpu/inference.

Batch dict convention (all NHWC, float32, device-resident):
  image_hr          (B, crop, crop, 3) in [-1, 1]      — GT, train/eval only
  label             (B, crop, crop)    int32           — raw label map
  input_semantics   (B, crop, crop, semantic_nc)       — one-hot (preprocess)
  image_lr          (B, start, start, 3)               — synthesized (preprocess)
  guiding_image / guiding_label                        — optional, guided model
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from deepsee_tpu.config import Experiment, ModelConfig
from deepsee_tpu.losses import DiscOut
from deepsee_tpu.models.discriminator import MultiscaleDiscriminator
from deepsee_tpu.models.encoder import build_encoder
from deepsee_tpu.models.generator import DeepSEEGenerator
from deepsee_tpu.models.vgg import VGG19Features
from deepsee_tpu.ops.preprocess import downsample_image, one_hot_label

MUTABLE = ("batch_stats", "spectral")


@flax.struct.dataclass
class SystemVariables:
    """All network variables; g/e/d are {"params", "batch_stats", "spectral"}."""

    g: Dict
    e: Optional[Dict]
    d: Optional[Dict]
    vgg: Optional[Dict]


class SRSystem:
    def __init__(self, exp: Experiment):
        self.exp = exp
        cfg = exp.model
        self.cfg = cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        self.generator = DeepSEEGenerator(cfg, remat=exp.train.remat,
                                          remat_policy=exp.train.remat_policy)
        self.encoder = build_encoder(cfg, dtype) if cfg.use_encoder else None
        self.discriminator = (MultiscaleDiscriminator(cfg, dtype)
                              if exp.is_train else None)
        self.vgg = (VGG19Features(dtype)
                    if exp.is_train and not exp.train.no_vgg_loss else None)

    # -- initialization ------------------------------------------------------

    def init(self, key: jax.Array) -> SystemVariables:
        cfg = self.cfg
        b = 1
        kg, ke, kd, kv, kn = jax.random.split(key, 5)
        lr = jnp.zeros((b, cfg.start_size, cfg.start_size, 3))
        hr = jnp.zeros((b, cfg.crop_size, cfg.crop_size, 3))
        seg = jnp.zeros((b, cfg.crop_size, cfg.crop_size, cfg.semantic_nc))
        style = jnp.zeros((b, cfg.label_nc, cfg.regional_style_size))

        # init in train mode so optional params (NoiseInjection weights,
        # architecture.py:54-58) are materialized
        g = dict(self.generator.init(
            {"params": kg, "noise": kn}, lr, seg, style, train=True))

        e = None
        if self.encoder is not None:
            rngs = {"params": ke, "noise": kn}
            # no_noise=False so style-noise params materialize at init
            if cfg.net_e == "combinedstyle":
                e = dict(self.encoder.init(rngs, hr, seg, lr, seg, True,
                                           no_noise=False, train=False))
            else:
                e = dict(self.encoder.init(rngs, hr, seg, no_noise=False,
                                           train=False))

        d = None
        if self.discriminator is not None:
            x = jnp.zeros((b, cfg.crop_size, cfg.crop_size,
                           cfg.semantic_nc + cfg.output_nc))
            d = dict(self.discriminator.init(kd, x, train=False))

        vgg = None
        if self.vgg is not None:
            vgg = dict(self.vgg.init(kv, hr))

        return SystemVariables(g=g, e=e, d=d, vgg=vgg)

    # -- preprocessing (data/preprocessor.py semantics, on device) -----------

    def preprocess(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        out = dict(batch)
        if "label" in batch and "input_semantics" not in batch:
            out["input_semantics"] = one_hot_label(batch["label"],
                                                   cfg.semantic_nc)
        if "guiding_label" in batch and batch["guiding_label"].ndim <= 3:
            out["guiding_label"] = one_hot_label(batch["guiding_label"],
                                                 cfg.semantic_nc)
        if "image_hr" in batch and "image_lr" not in batch:
            out["image_lr"] = downsample_image(
                batch["image_hr"], (cfg.start_size, cfg.start_size),
                method=cfg.downsampling_method)
        return out

    # -- style encoding (sr_model.py:582-650) --------------------------------

    def encoder_inputs(self, batch: Dict[str, jnp.ndarray]):
        """Pick the HR style source: guiding image when configured, else GT.
        (sr_model.py:601-626)."""
        cfg = self.cfg
        sem = batch["input_semantics"]
        if cfg.guiding_style_image and "guiding_image" in batch:
            return batch["guiding_image"], batch["guiding_label"]
        hr = batch.get("image_hr")
        if hr is None:
            # inference without GT: zeros keep shapes static; callers choose
            # use_full=False in that case.
            hr = jnp.zeros(sem.shape[:3] + (3,), batch["image_lr"].dtype)
        return hr, sem

    def encode_style(self, e_vars: Dict, batch: Dict[str, jnp.ndarray], *,
                     use_full, no_noise, train: bool,
                     rngs: Optional[Dict] = None, mutable: bool = False):
        """Returns the (B, label_nc, style_size) style matrix.

        use_full / no_noise may be traced booleans (the reference flips host
        coins at sr_model.py:616,643; the trainer passes bernoulli draws)."""
        cfg = self.cfg
        x_full, seg_full = self.encoder_inputs(batch)
        kw = dict(no_noise=no_noise, train=train)
        mut = MUTABLE if mutable else False
        if cfg.net_e == "combinedstyle":
            args = (x_full, seg_full, batch["image_lr"],
                    batch["input_semantics"], use_full)
        else:  # fullstyle (guided): always the full path
            args = (x_full, seg_full)
        return self.encoder.apply(e_vars, *args, rngs=rngs, mutable=mut, **kw)

    # -- generation (sr_model.py:566-580) -------------------------------------

    def generate(self, g_vars: Dict, e_vars: Optional[Dict],
                 batch: Dict[str, jnp.ndarray], *,
                 style: Optional[jnp.ndarray] = None,
                 use_full=True, no_noise=True, train: bool = False,
                 rngs: Optional[Dict] = None, mutable: bool = False):
        """Encode style (unless given) and run the generator.

        Returns (fake_image, style, (mutated_e, mutated_g)) — mutated dicts
        empty when mutable=False."""
        mut_e: Dict = {}
        if style is None and self.encoder is not None:
            enc = self.encode_style(e_vars, batch, use_full=use_full,
                                    no_noise=no_noise, train=train, rngs=rngs,
                                    mutable=mutable)
            style, mut_e = enc if mutable else (enc, {})

        out = self.generator.apply(
            g_vars, batch["image_lr"], batch["input_semantics"], style,
            train=train, rngs=rngs, mutable=MUTABLE if mutable else False)
        fake, mut_g = out if mutable else (out, {})
        return fake, style, (mut_e, mut_g)

    # -- jitted entry points for inference-time callers -----------------------
    # (the explorative modes and demo; the evaluator/trainer build their own
    # fused jitted steps).  jax.jit caches per call signature, so a mode
    # reusing the same shapes costs one compile.

    @functools.cached_property
    def generate_jit(self):
        """Jitted generate: (g_vars, e_vars, batch, style, use_full,
        no_noise, rngs) -> (fake, style).  use_full / no_noise are STATIC
        Python bools (no_noise=True statically skips the noise RNG); for a
        traced coin use generate_coin_jit."""
        def fn(g_vars, e_vars, batch, style, use_full, no_noise, rngs):
            fake, style_out, _ = self.generate(
                g_vars, e_vars, batch, style=style, use_full=use_full,
                no_noise=no_noise, train=False, rngs=rngs)
            return fake, style_out
        return jax.jit(fn, static_argnums=(4, 5))

    @functools.cached_property
    def generate_coin_jit(self):
        """Like generate_jit but with a TRACED no_noise bernoulli and
        required rngs (inference_noise's 50% coin, sr_model.py:641-644)."""
        def fn(g_vars, e_vars, batch, no_noise, rngs):
            fake, _, _ = self.generate(
                g_vars, e_vars, batch, style=None, use_full=False,
                no_noise=no_noise, train=False, rngs=rngs)
            return fake
        return jax.jit(fn)

    @functools.cached_property
    def encode_jit(self):
        def fn(e_vars, batch, use_full, no_noise):
            return self.encode_style(e_vars, batch, use_full=use_full,
                                     no_noise=no_noise, train=False)
        return jax.jit(fn, static_argnums=(2, 3))

    @functools.cached_property
    def preprocess_jit(self):
        return jax.jit(self.preprocess)

    # -- discrimination (sr_model.py:655-683) ---------------------------------

    def discriminate(self, d_vars: Dict, input_semantics: jnp.ndarray,
                     fake: jnp.ndarray, real: jnp.ndarray, *,
                     train: bool = False, mutable: bool = False
                     ) -> Tuple[DiscOut, DiscOut, Dict]:
        """Run fake and real through D in one 2B batch and split."""
        fake_concat = jnp.concatenate([input_semantics, fake], axis=-1)
        real_concat = jnp.concatenate([input_semantics, real], axis=-1)
        both = jnp.concatenate([fake_concat, real_concat], axis=0)
        out = self.discriminator.apply(d_vars, both, train=train,
                                       mutable=MUTABLE if mutable else False)
        preds, mut_d = out if mutable else (out, {})
        b = fake.shape[0]
        pred_fake = [[t[:b] for t in scale] for scale in preds]
        pred_real = [[t[b:] for t in scale] for scale in preds]
        return pred_fake, pred_real, mut_d

    def vgg_features(self, vgg_vars: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
        return self.vgg.apply(vgg_vars, x)


def merge_mutations(variables: Dict, mutated: Dict) -> Dict:
    """Fold mutated collections (batch_stats/spectral) back into a vars dict."""
    if not mutated:
        return variables
    out = dict(variables)
    for coll, tree in dict(mutated).items():
        out[coll] = tree
    return out
