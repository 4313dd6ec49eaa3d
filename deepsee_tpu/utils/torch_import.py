"""Import PyTorch DeepSEE checkpoints into deepsee_tpu variable pytrees.

The reference saves per-network state dicts `<epoch>_net_{SR,D,E}.pth`
(util/util.py:217-237).  Module names here intentionally mirror the torch
module paths, so translation is a handful of mechanical rules:

  torch OIHW conv weights        -> HWIO kernels (transpose 2,3,1,0)
  spectral_norm weight_orig/u/v  -> params.kernel + spectral.{u,v}
                                    (v permuted from (I,KH,KW) to (KH,KW,I)
                                    flatten order; sigma is flatten-invariant)
  running_mean / running_var     -> batch_stats.{mean,var}
  Sequential indices (.0.0)      -> named submodules (see _RULES)

Dead reference params (SEAN's unused style_conv at normalization.py:156, the
unused per-trunk `final` heads inside CombinedstyleEncoder) have no
counterpart here and are ignored.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

try:  # torch is only needed to deserialize .pth files
    import torch
except ImportError:  # pragma: no cover
    torch = None

# flax-module-path -> torch-module-path rewrite rules (dotted, no leaf)
_RULES = (
    # generator: up_<i> modules live in an nn.ModuleList named up_list
    (re.compile(r"^up_(\d+)(\.|$)"), r"up_list.\1\2"),
    (re.compile(r"(^|\.)pfn\.param_free_norm"), r"\1param_free_norm"),
    # standalone encoders place their trunk layers at the top level
    (re.compile(r"^trunk\."), ""),
    (re.compile(r"(^|\.)core\.mlp_shared"), r"\1mlp_shared"),
    # SPADE/SEAN mlp_shared is Sequential(conv, relu)
    (re.compile(r"(^|\.)mlp_shared$"), r"\1mlp_shared.0"),
    # encoder trunk layers: Sequential(Sequential(conv, norm), lrelu)
    (re.compile(r"(^|\.)(initial|down0|down1|conv0|conv1)\.conv$"), r"\1\2.0.0"),
    # ... with a leading Upsample: Sequential(Upsample, Seq(conv, norm), lrelu)
    (re.compile(r"(^|\.)(up_conv|conv2)\.conv$"), r"\1\2.1.0"),
    # shared final head: Sequential(Seq(conv, norm), tanh)
    (re.compile(r"(^|\.)final\.conv\.conv$"), r"\1final.0.0"),
    # style-noise wrapper is flattened into the encoder in torch
    (re.compile(r"(^|\.)style_noise$"), r"\1"),
    # discriminator: normed middle layers, then raw first/last convs
    (re.compile(r"(^|\.)model(\d+)\.conv$"), r"\1model\2.0.0"),
    (re.compile(r"(^|\.)model(\d+)$"), r"\1model\2.0"),
)

_LEAF = {
    "kernel": "weight",       # or weight_orig when spectral
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
    "scale": "weight",        # affine batch norm
    "u": "weight_u",
    "v": "weight_v",
}


def _flax_to_torch_key(path: Tuple[str, ...]) -> str:
    *mods, leaf = path
    name = ".".join(mods)
    for pat, rep in _RULES:
        name = pat.sub(rep, name)
    name = name.strip(".")
    mapped = _LEAF.get(leaf, leaf)
    return f"{name}.{mapped}" if name else mapped


def _flatten(tree: Mapping, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict:
    out: Dict = {}
    for path, v in flat.items():
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = v
    return out


def _to_np(t) -> np.ndarray:
    # Copy: tensor.numpy() shares memory with torch, and jax CPU arrays can
    # zero-copy numpy — without the copy, later in-place torch updates
    # (e.g. running stats) would silently mutate the imported values.
    if hasattr(t, "detach"):
        return np.array(t.detach().cpu().numpy(), copy=True)
    return np.array(t, copy=True)


def import_torch_state(variables: Mapping, state_dict: Mapping[str, Any],
                       strict: bool = True) -> Dict:
    """Fill a flax variables pytree from a torch state_dict.

    variables: {"params": ..., "batch_stats": ..., "spectral": ...} template
    (e.g. from module.init).  Returns a new pytree of the same structure.
    """
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    new: Dict[str, Dict] = {}
    missing = []

    params_flat = _flatten(variables.get("params", {}))

    for coll, tree in variables.items():
        flat = _flatten(tree)
        out = {}
        for path, val in flat.items():
            leaf = path[-1]
            base = _flax_to_torch_key(path)
            if coll == "params" and leaf == "kernel":
                key = base[:-len("weight")] + "weight_orig"
                if key not in sd:
                    key = base
                if key not in sd:
                    missing.append(key)
                    out[path] = val
                    continue
                w = sd[key]
                out[path] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)),
                                        dtype=val.dtype)
            elif coll == "spectral" and leaf == "v":
                if base not in sd:
                    missing.append(base)
                    out[path] = val
                    continue
                # torch flat order (I,KH,KW) -> ours (KH,KW,I)
                kpath = path[:-1] + ("kernel",)
                kh, kw, cin, _ = params_flat[kpath].shape
                v = sd[base].reshape(cin, kh, kw).transpose(1, 2, 0).reshape(-1)
                out[path] = jnp.asarray(v, dtype=val.dtype)
            else:
                if base not in sd:
                    missing.append(base)
                    out[path] = val
                    continue
                out[path] = jnp.asarray(sd[base], dtype=val.dtype).reshape(val.shape)
        new[coll] = _unflatten(out)

    if strict and missing:
        raise KeyError(f"Missing torch keys ({len(missing)}): {missing[:8]}...")
    return new


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    if torch is None:
        raise RuntimeError("torch unavailable; cannot read .pth checkpoints")
    sd = torch.load(path, map_location="cpu", weights_only=True)
    # the reference's save_network wraps the state dict as {"model": sd}
    # (util/util.py:217-224); load_network unwraps it (:238-234)
    if isinstance(sd, dict) and set(sd) == {"model"}:
        sd = sd["model"]
    return sd


def import_reference_checkpoint(system, checkpoint_dir: str,
                                epoch: str = "latest",
                                variables=None, include_d: bool = False):
    """Load a released reference checkpoint (`<epoch>_net_{SR,E,D}.pth`,
    util/util.py:217-237) into SystemVariables for this system.

    `variables`: optional init template (defaults to a fresh system.init).
    The D net is only loaded with include_d=True (inference doesn't need it).
    """
    import os

    import jax

    from deepsee_tpu.system import SystemVariables

    if variables is None:
        variables = system.init(jax.random.PRNGKey(0))

    def path(tag: str) -> str:
        return os.path.join(checkpoint_dir, f"{epoch}_net_{tag}.pth")

    g = import_torch_state(variables.g, load_torch_checkpoint(path("SR")),
                           strict=True)
    e = variables.e
    if e is not None and os.path.exists(path("E")):
        e = import_torch_state(e, load_torch_checkpoint(path("E")),
                               strict=True)
    d = variables.d
    if include_d and os.path.exists(path("D")):
        if d is None:  # inference systems don't build D; init one to fill
            from deepsee_tpu.models.discriminator import \
                MultiscaleDiscriminator
            cfg = system.cfg
            disc = system.discriminator or MultiscaleDiscriminator(cfg)
            x = jnp.zeros((1, cfg.crop_size, cfg.crop_size,
                           cfg.semantic_nc + cfg.output_nc))
            d = dict(disc.init(jax.random.PRNGKey(0), x, train=False))
        d = import_torch_state(d, load_torch_checkpoint(path("D")),
                               strict=True)
    print(f"Imported reference checkpoint '{epoch}' from {checkpoint_dir}")
    return SystemVariables(g=g, e=e, d=d if include_d else None,
                           vgg=variables.vgg)
