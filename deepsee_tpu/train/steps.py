"""Jitted GAN training step.

One fused step = generator update then discriminator update, matching the
reference loop order (train.py:40-44: G step when i % D_steps_per_G == 0,
then D step every iteration).  Faithful details:

  * the D step REGENERATES the fake with fresh stochastic choices and a
    stop_gradient (sr_model.py:550-553), using the just-updated G params;
  * generator/encoder batch stats and spectral u/v update during BOTH steps
    (torch updates them on any train-mode forward, incl. under no_grad);
  * the discriminator's spectral u/v update during the G step's discriminate
    call too;
  * per-step coins: full-vs-mini encoder source and style-noise on/off are
    Bernoulli(0.5) for the independent model (sr_model.py:616,643).

Everything (preprocessing included) runs inside one jit; donate the state.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from deepsee_tpu.losses import feature_matching_loss, gan_loss, vgg_loss
from deepsee_tpu.system import SRSystem, merge_mutations
from deepsee_tpu.train.state import (TrainState, g_diff_params,
                                     make_d_optimizer, make_g_optimizer)


def make_train_step(system: SRSystem, *, do_g: bool = True, donate: bool = True):
    exp = system.exp
    cfg = system.cfg
    tc = exp.train
    tx_g = make_g_optimizer(tc)
    tx_d = make_d_optimizer(tc)
    independent = cfg.model_variant == "independent"

    def coins(key):
        """(use_full, no_noise) for one encode (sr_model.py:611-629,641-644)."""
        if not independent:
            return jnp.bool_(True), jnp.bool_(False)
        k1, k2 = jax.random.split(key)
        return (jax.random.bernoulli(k1, 0.5), jax.random.bernoulli(k2, 0.5))

    def g_update(state: TrainState, batch, key) -> Tuple[TrainState, Dict, jnp.ndarray]:
        k_coin, k_noise = jax.random.split(key)
        use_full, no_noise = coins(k_coin)
        real = batch["image_hr"]
        sem = batch["input_semantics"]

        def loss_fn(diff):
            g_vars = dict(state.g_vars, params=diff["g"])
            e_vars = (dict(state.e_vars, params=diff["e"])
                      if state.e_vars is not None else None)
            fake, _, (mut_e, mut_g) = system.generate(
                g_vars, e_vars, batch, use_full=use_full, no_noise=no_noise,
                train=True, rngs={"noise": k_noise}, mutable=True)
            pred_fake, pred_real, mut_d = system.discriminate(
                state.d_vars, sem, fake, real, train=True, mutable=True)

            losses = {"GAN": gan_loss(pred_fake, True, mode=tc.gan_mode,
                                      for_discriminator=False)}
            if not tc.no_ganfeat_loss:
                losses["GAN_Feat"] = feature_matching_loss(
                    pred_fake, pred_real, tc.lambda_feat)
            if system.vgg is not None:
                losses["VGG"] = vgg_loss(system.vgg_features(state.vgg, fake),
                                         system.vgg_features(state.vgg, real),
                                         tc.lambda_vgg)
            total = sum(losses.values())
            return total, (losses, fake, mut_g, mut_e, mut_d)

        diff = g_diff_params(state)
        (_, (losses, fake, mut_g, mut_e, mut_d)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(diff)
        updates, opt_g = tx_g.update(grads, state.opt_g, diff)
        diff = optax.apply_updates(diff, updates)

        g_vars = dict(merge_mutations(state.g_vars, mut_g), params=diff["g"])
        e_vars = state.e_vars
        if e_vars is not None:
            e_vars = dict(merge_mutations(e_vars, mut_e), params=diff["e"])
        d_vars = merge_mutations(state.d_vars, mut_d)
        state = state.replace(g_vars=g_vars, e_vars=e_vars, d_vars=d_vars,
                              opt_g=opt_g)
        return state, losses, fake

    def d_update(state: TrainState, batch, key,
                 fake=None) -> Tuple[TrainState, Dict]:
        real = batch["image_hr"]
        sem = batch["input_semantics"]

        if fake is None:
            # regenerate under stop_gradient with fresh randomness using
            # the just-updated G (faithful: sr_model.py:550-553)
            k_coin, k_noise = jax.random.split(key)
            use_full, no_noise = coins(k_coin)
            fake, _, (mut_e, mut_g) = system.generate(
                state.g_vars, state.e_vars, batch, use_full=use_full,
                no_noise=no_noise, train=True, rngs={"noise": k_noise},
                mutable=True)
            state = state.replace(
                g_vars=merge_mutations(state.g_vars, mut_g),
                e_vars=(merge_mutations(state.e_vars, mut_e)
                        if state.e_vars is not None else None))
        fake = jax.lax.stop_gradient(fake)

        def loss_fn(d_params):
            d_vars = dict(state.d_vars, params=d_params)
            pred_fake, pred_real, mut_d = system.discriminate(
                d_vars, sem, fake, real, train=True, mutable=True)
            losses = {
                "D_Fake": gan_loss(pred_fake, False, mode=tc.gan_mode),
                "D_real": gan_loss(pred_real, True, mode=tc.gan_mode),
            }
            return sum(losses.values()), (losses, mut_d)

        (_, (losses, mut_d)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.d_vars["params"])
        updates, opt_d = tx_d.update(grads, state.opt_d,
                                     state.d_vars["params"])
        new_d_params = optax.apply_updates(state.d_vars["params"], updates)
        d_vars = dict(merge_mutations(state.d_vars, mut_d), params=new_d_params)
        return state.replace(d_vars=d_vars, opt_d=opt_d), losses

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        batch = system.preprocess(batch)
        rng, kg, kd = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng)
        logs: Dict[str, jnp.ndarray] = {}
        fake = None
        if do_g:
            state, g_losses, g_fake = g_update(state, batch, kg)
            logs.update(g_losses)
            if tc.reuse_fake:
                fake = g_fake
        state, d_losses = d_update(state, batch, kd, fake=fake)
        logs.update(d_losses)
        state = state.replace(step=state.step + 1)
        return state, logs

    return jax.jit(step, donate_argnums=(0,) if donate else ())
