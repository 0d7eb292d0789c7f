"""Import the reference's whole-module torch pickles into our pytrees.

The reference checkpoints (``outputs/pre_training_v1_GIN_64_5_1.pt``) are
``torch.save(model)`` pickles of entire ``Mainmodel_continue`` modules
(exp_pretraining.py:106-141) whose class definitions import DGL — not
available here.  ``load_reference_state`` unpickles them with *shell
classes* standing in for every unimportable class, then walks the
``nn.Module`` ``_parameters``/``_buffers``/``_modules`` structure to a flat
``name -> numpy`` dict using standard torch naming.

Curriculum nesting (important): each ``Mainmodel_continue`` wraps the
previous stage at ``self.model`` but its **forward trains the wrapped
model's encoders while its own stay at random init**
(models.py:1167 ``self.model.extract_features`` vs models.py:1204
``extract_features`` using ``self.Encoder1``).  So in a stage-N
checkpoint the *trained* core lives one level down (``model.Encoder1...``),
and the outermost encoders are untouched — detectable because their
BatchNorm running stats are still exactly (0, 1).
``convert_to_pretrain_variables`` therefore selects the nesting depth
whose BatchNorms have actually been updated (or a user-given depth).
"""

from __future__ import annotations

import io
import pickle
import sys
import types
from typing import Any, Dict, Optional, Tuple

import numpy as np


class _Shell:
    """Stand-in for any unimportable class in the pickle."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


class _ShellUnpickler(pickle.Unpickler):
    """Unpickler that substitutes a ``_Shell`` subclass for every class
    whose module cannot be imported (the reference's ``models`` module and
    all of DGL)."""

    _cache: Dict[Tuple[str, str], type] = {}

    def find_class(self, module: str, name: str):
        try:
            return super().find_class(module, name)
        except Exception:
            key = (module, name)
            if key not in self._cache:
                self._cache[key] = type(
                    name, (_Shell,), {"__module__": module})
            return self._cache[key]


def _shell_pickle_module() -> types.ModuleType:
    mod = types.ModuleType("_shell_pickle")
    mod.Unpickler = _ShellUnpickler
    mod.load = pickle.load
    mod.__name__ = "pickle"
    return mod


def load_reference_state(path: str) -> Dict[str, np.ndarray]:
    """Flat ``name -> numpy array`` state of a whole-module reference
    pickle, torch naming (``model.Encoder1.ginlayers.0.apply_func.mlp.0.
    weight`` ...).  Buffers (BN running stats) are included."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False,
                     pickle_module=_shell_pickle_module())

    flat: Dict[str, np.ndarray] = {}

    def walk(o: Any, prefix: str) -> None:
        d = getattr(o, "__dict__", None)
        if d is None:
            return
        for store in ("_parameters", "_buffers"):
            for k, v in (d.get(store) or {}).items():
                if v is not None and hasattr(v, "detach"):
                    flat[prefix + k] = v.detach().cpu().numpy()
        for k, v in (d.get("_modules") or {}).items():
            if v is not None:
                walk(v, f"{prefix}{k}.")
        # shell objects that were torch ModuleList/Sequential keep their
        # inner modules in _modules; DGL shells (e.g. GINConv) keep theirs
        # too since dgl modules subclass nn.Module.

    walk(obj, "")
    return flat


def nesting_depths(flat: Dict[str, np.ndarray]) -> int:
    """How many ``model.``-nested levels the checkpoint has."""
    depth = 0
    prefix = "model."
    while any(k.startswith(prefix) for k in flat):
        depth += 1
        prefix = "model." + prefix
    return depth


def bn_trained_at_depth(flat: Dict[str, np.ndarray], depth: int) -> bool:
    """True iff the Encoder BatchNorm running stats at this nesting depth
    differ from their (0, 1) init — i.e. the encoders actually ran."""
    p = "model." * depth
    for enc in ("Encoder1", "Encoder2"):
        for k, v in flat.items():
            if k.startswith(f"{p}{enc}.batch_norms.") and \
                    k.endswith("running_var"):
                if not np.allclose(v, 1.0):
                    return True
    return False


def trained_core_depth(flat: Dict[str, np.ndarray]) -> int:
    """Shallowest nesting depth whose encoders were actually trained."""
    for depth in range(nesting_depths(flat) + 1):
        if bn_trained_at_depth(flat, depth):
            return depth
    return 0


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def convert_to_pretrain_variables(
        flat: Dict[str, np.ndarray],
        depth: Optional[int] = None,
        head_depth: int = 0) -> Tuple[Dict[str, Any], int]:
    """Build our ``PretrainModel`` variables from a reference state dict.

    ``depth``: nesting level supplying the core (encoders, compressor,
    attention); default = shallowest level with trained BatchNorms.
    ``head_depth``: level supplying ``transfer_d`` and the head MLP (the
    outermost object's heads are the ones its forward trains — 0).

    Returns (variables, meta) with meta = {'core_depth', 'num_convs'} —
    pass num_convs as the model's ``num_layers`` (the shipped artifact has
    5 conv layers although the released GIN class builds 4).  Only GIN
    cores are supported (the shipped artifact is GIN, README.md:56-57).
    """
    if depth is None:
        depth = trained_core_depth(flat)
    cp = "model." * depth
    hp = "model." * head_depth

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["transfer_d"] = {"kernel": _t(flat[f"{hp}transfer_d.weight"])}
    params["head_mlp"] = {
        "Dense_0": {"kernel": _t(flat[f"{hp}MLP.0.weight"]),
                    "bias": flat[f"{hp}MLP.0.bias"]},
        "Dense_1": {"kernel": _t(flat[f"{hp}MLP.2.weight"]),
                    "bias": flat[f"{hp}MLP.2.bias"]},
    }

    core_p: Dict[str, Any] = {}
    core_s: Dict[str, Any] = {}
    for enc_ref, enc_ours in (("Encoder1", "encoder1"),
                              ("Encoder2", "encoder2")):
        ep: Dict[str, Any] = {}
        es: Dict[str, Any] = {}
        i = 0
        while f"{cp}{enc_ref}.ginlayers.{i}.apply_func.mlp.0.weight" in flat:
            base = f"{cp}{enc_ref}.ginlayers.{i}.apply_func.mlp"
            ep[f"conv{i}"] = {
                "Dense_0": {"kernel": _t(flat[f"{base}.0.weight"]),
                            "bias": flat[f"{base}.0.bias"]},
                "Dense_1": {"kernel": _t(flat[f"{base}.2.weight"]),
                            "bias": flat[f"{base}.2.bias"]},
            }
            bn = f"{cp}{enc_ref}.batch_norms.{i}"
            ep[f"bn{i}"] = {"scale": flat[f"{bn}.weight"],
                            "bias": flat[f"{bn}.bias"]}
            es[f"bn{i}"] = {"mean": flat[f"{bn}.running_mean"],
                            "var": flat[f"{bn}.running_var"]}
            i += 1
        if i == 0:
            raise ValueError(
                f"no GIN layers found at depth {depth} for {enc_ref}; "
                "is this a GIN checkpoint?")
        num_convs = i
        core_p[enc_ours] = ep
        core_s[enc_ours] = es

    core_p["compressor"] = {
        "fc1": {"kernel": _t(flat[f"{cp}compressor.0.weight"]),
                "bias": flat[f"{cp}compressor.0.bias"]},
        "fc2": {"kernel": _t(flat[f"{cp}compressor.3.weight"]),
                "bias": flat[f"{cp}compressor.3.bias"]},
        "bn": {"scale": flat[f"{cp}compressor.1.weight"],
               "bias": flat[f"{cp}compressor.1.bias"]},
    }
    core_s["compressor"] = {
        "bn": {"mean": flat[f"{cp}compressor.1.running_mean"],
               "var": flat[f"{cp}compressor.1.running_var"]},
    }
    core_p["attn_layer"] = {
        "kernel": _t(flat[f"{cp}attn_layer.weight"]),
        "bias": flat[f"{cp}attn_layer.bias"],
    }
    params["core"] = core_p
    stats["core"] = core_s

    return ({"params": params, "batch_stats": stats},
            {"core_depth": depth, "num_convs": num_convs})
