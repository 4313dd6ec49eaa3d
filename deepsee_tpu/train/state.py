"""Train state + optimizers.

Mirrors SRModel.create_optimizers (sr_model.py:469-495):
  * one Adam over generator + encoder params, TTUR lr = lr/2
  * encoder params whose path contains "mini" get lr/4 (implemented as a
    masked 0.25 update scale after Adam — exactly a lower per-group lr)
  * one Adam over discriminator params, TTUR lr = 2*lr
  * Adam(beta1, beta2, eps=1e-8), optional clip-by-value before Adam
    (trainer_manager.py:38-42)
  * linear per-epoch lr decay after `niter` epochs via injected hyperparams
    (trainer_manager.py:76-96)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from deepsee_tpu.config import Experiment, TrainConfig
from deepsee_tpu.system import SRSystem, SystemVariables


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    g_vars: Dict
    e_vars: Optional[Dict]
    d_vars: Dict
    vgg: Optional[Dict]
    opt_g: Any
    opt_d: Any
    rng: jax.Array


def _mini_mask(params: Dict) -> Dict:
    """True for params under a module whose name contains 'mini'
    (sr_model.py:474-478)."""

    def walk(tree, in_mini):
        if isinstance(tree, dict):
            return {k: walk(v, in_mini or "mini" in k) for k, v in tree.items()}
        return in_mini

    return walk(params, False)


def _adam_chain(tc: TrainConfig, with_mini_group: bool):
    def make(lr):
        parts = []
        if tc.gradient_clip > 0:
            parts.append(optax.clip(tc.gradient_clip))
        parts.append(optax.scale_by_adam(b1=tc.beta1, b2=tc.beta2, eps=1e-8))
        if with_mini_group:
            parts.append(optax.masked(optax.scale(0.25), _mini_mask))
        parts.append(optax.scale(-lr))
        return optax.chain(*parts)

    return make


def make_g_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    return optax.inject_hyperparams(_adam_chain(tc, True))(lr=tc.g_lr())


def make_d_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    return optax.inject_hyperparams(_adam_chain(tc, False))(lr=tc.d_lr())


def g_diff_params(state: TrainState) -> Dict:
    """The pytree the G optimizer owns: generator + encoder params."""
    diff = {"g": state.g_vars["params"]}
    if state.e_vars is not None:
        diff["e"] = state.e_vars["params"]
    return diff


def _load_pretrained_vgg(exp: Experiment,
                         variables: SystemVariables) -> SystemVariables:
    """Swap the VGG loss net's random init for pretrained torchvision VGG19
    weights (reference always trains with pretrained VGG,
    networks/architecture.py:151-158)."""
    if variables.vgg is None:
        return variables
    path = exp.train.vgg_weights
    if not path:
        print("WARNING: training with RANDOM VGG19 features for the "
              "perceptual loss — pass --vgg_weights <torchvision vgg19 .pth> "
              "for reference-equivalent training (loss.py:105-119).")
        return variables
    from deepsee_tpu.models.vgg import load_vgg19_params
    loaded = load_vgg19_params(path)
    init_params = variables.vgg["params"]
    assert set(loaded) == set(init_params), (
        f"VGG weight file keys mismatch: {sorted(set(init_params) - set(loaded))}")
    for k, v in loaded.items():
        assert v.shape == init_params[k].shape, (
            f"VGG param {k}: file shape {v.shape} != model {init_params[k].shape}")
    print(f"Loaded pretrained VGG19 perceptual-loss weights from {path}")
    return SystemVariables(g=variables.g, e=variables.e, d=variables.d,
                           vgg={**variables.vgg, "params": loaded})


def create_train_state(system: SRSystem, key: jax.Array,
                       variables: Optional[SystemVariables] = None
                       ) -> TrainState:
    exp = system.exp
    k_init, k_state = jax.random.split(key)
    if variables is None:
        variables = system.init(k_init)

    variables = _load_pretrained_vgg(exp, variables)

    tx_g = make_g_optimizer(exp.train)
    tx_d = make_d_optimizer(exp.train)

    diff = {"g": variables.g["params"]}
    if variables.e is not None:
        diff["e"] = variables.e["params"]

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_vars=variables.g,
        e_vars=variables.e,
        d_vars=variables.d,
        vgg=variables.vgg,
        opt_g=tx_g.init(diff),
        opt_d=tx_d.init(variables.d["params"]),
        rng=k_state,
    )


def set_epoch_lr(state: TrainState, exp: Experiment, epoch: int) -> TrainState:
    """Apply the per-epoch linear decay to both optimizers' injected lr."""
    scale = exp.train.epoch_lr_scale(epoch)
    og, od = state.opt_g, state.opt_d
    og.hyperparams["lr"] = jnp.asarray(exp.train.g_lr() * scale, jnp.float32)
    od.hyperparams["lr"] = jnp.asarray(exp.train.d_lr() * scale, jnp.float32)
    return state.replace(opt_g=og, opt_d=od)
