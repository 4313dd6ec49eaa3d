"""Import/export PyTorch DeepSEE checkpoints <-> deepsee_tpu variable pytrees.

The reference saves per-network state dicts `<epoch>_net_{SR,D,E}.pth`
(util/util.py:217-237).  Module names here intentionally mirror the torch
module paths, so translation is a handful of mechanical rules:

  torch OIHW conv weights        -> HWIO kernels (transpose 2,3,1,0)
  spectral_norm weight_orig/u/v  -> params.kernel + spectral.{u,v}
                                    (v permuted from (I,KH,KW) to (KH,KW,I)
                                    flatten order; sigma is flatten-invariant)
  running_mean / running_var     -> batch_stats.{mean,var}
  Sequential indices (.0.0)      -> named submodules (see _RULES)

Dead reference params (SEAN's unused style_conv at normalization.py:156 and
:247, the unused per-trunk `final` heads inside CombinedstyleEncoder) have no
counterpart here: the importer ignores them and the exporter synthesizes
them (plus torch's num_batches_tracked BN bookkeeping) so the reference's
strict `load_state_dict` accepts exported checkpoints unchanged.
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


# ---------------------------------------------------------------------------
# Export: deepsee_tpu variables -> reference-format torch checkpoints, the
# exact inverse of the import above, so models trained here deploy into the
# reference's torch stack (or reload via --torch_checkpoint).


def export_torch_state(variables: Mapping) -> Dict[str, Any]:
    """Inverse of import_torch_state: one network's flax variables
    ({"params", "batch_stats", "spectral"}) -> a torch state_dict in the
    reference's key layout (OIHW conv weights, weight_orig/u/v spectral
    naming, running stats).  Values are torch float32 tensors."""
    if torch is None:
        raise RuntimeError("torch unavailable; cannot build .pth state dicts")

    params_flat = _flatten(variables.get("params", {}))
    spectral_mods = {p[:-1] for p in _flatten(variables.get("spectral", {}))
                     if p[-1] == "u"}
    sd: Dict[str, Any] = {}
    for coll, tree in variables.items():
        for path, val in _flatten(tree).items():
            key = _flax_to_torch_key(path)
            arr = np.asarray(val, dtype=np.float32)
            if coll == "params" and path[-1] == "kernel":
                arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
                if path[:-1] in spectral_mods:
                    key = key[: -len("weight")] + "weight_orig"
            elif coll == "spectral" and path[-1] == "v":
                # ours flattens (KH,KW,I); torch flattens (I,KH,KW)
                kh, kw, cin, _ = params_flat[path[:-1] + ("kernel",)].shape
                arr = arr.reshape(kh, kw, cin).transpose(2, 0, 1).reshape(-1)
            sd[key] = torch.from_numpy(np.array(arr))
    return sd


def complete_for_reference(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Add the reference-module keys that have no deepsee_tpu counterpart,
    so the reference's strict `net.load_state_dict` (util/util.py:228-237)
    accepts the exported dict:

      * `num_batches_tracked` next to every running_mean (torch _BatchNorm
        bookkeeping; SynchronizedBatchNorm2d subclasses _BatchNorm too)
      * the dead `style_conv` Conv1d(19,19,1) in every SEAN/PureSEAN block
        (normalization.py:156, :247 — constructed, never used in forward)
      * the dead per-trunk `final` heads of CombinedstyleEncoder
        (encoder.py:24-27 built by the AbstractStyleEncoder base for each
        sub-encoder; the combined forward only uses the shared head)

    Synthesized values are zeros — the reference never reads them.
    """
    out = dict(sd)
    if any(k.startswith("encoder_full.") for k in sd):
        for key, val in sd.items():
            if key.startswith("final."):
                out["encoder_full." + key] = torch.zeros_like(val)
                out["encoder_mini." + key] = torch.zeros_like(val)
    # Iterate over `out` (not `sd`) so sub-encoder final heads copied above
    # also get num_batches_tracked if norm_E is ever a batch-norm variant.
    for key, val in list(out.items()):
        if key.endswith("running_mean"):
            out[key[: -len("running_mean")] + "num_batches_tracked"] = (
                torch.tensor(0, dtype=torch.int64))
        if key.endswith("mlp_style_gamma.weight"):
            base = key[: -len("mlp_style_gamma.weight")]
            out[base + "style_conv.weight"] = torch.zeros(19, 19, 1)
            out[base + "style_conv.bias"] = torch.zeros(19)
    return out


def export_reference_checkpoint(variables, checkpoint_dir: str,
                                epoch: str = "latest") -> Dict[str, str]:
    """Write `<epoch>_net_{SR,E,D}.pth` files in the reference's exact
    save_network format ({"model": state_dict}, util/util.py:217-224).

    `variables`: anything with .g/.e/.d network trees (SystemVariables);
    nets that are None are skipped.  Returns {tag: path} for what was
    written; the files load directly via the reference's load_network or
    back through import_reference_checkpoint / --torch_checkpoint.
    """
    import os

    os.makedirs(checkpoint_dir, exist_ok=True)
    written: Dict[str, str] = {}
    for tag, tree in (("SR", variables.g), ("E", variables.e),
                      ("D", variables.d)):
        if tree is None:
            continue
        sd = complete_for_reference(export_torch_state(tree))
        path = os.path.join(checkpoint_dir, f"{epoch}_net_{tag}.pth")
        torch.save({"model": sd}, path)
        written[tag] = path
    return written
