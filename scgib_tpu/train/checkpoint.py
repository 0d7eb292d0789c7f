"""Checkpointing — pytree state dicts on disk.

The reference pickles whole torch modules (``torch.save(model)``,
exp_pretraining.py:114; loaded inside constructors, models.py:422, 1077)
keyed by a filename that encodes the config:
``pre_training_{datasets}_{encoder}_{hidden}_{layers}_{k}.pt``.

Here a checkpoint is (a) a msgpack file of the variables pytree
(params + batch_stats) via flax.serialization and (b) a JSON sidecar with
the model config and step — explicit data, no pickled code.  The curriculum
stage-skip behavior (exp_pretraining.py:106,120,133 "skip if the output
file exists") is reproduced by ``exists``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def checkpoint_name(prefix: str, datasets, encoder: str, hidden: int,
                    num_layers: int, k_transition: int) -> str:
    """Reference-style config-keyed name (exp_pretraining.py:103)."""
    ds = "_".join(datasets) if not isinstance(datasets, str) else datasets
    return f"{prefix}_{ds}_{encoder}_{hidden}_{num_layers}_{k_transition}"


def save_checkpoint(path: str, variables: Dict[str, Any],
                    config: Optional[Dict[str, Any]] = None,
                    step: int = 0) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    blob = serialization.msgpack_serialize(host_vars)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    meta = {"step": int(step), "config": config or {}}
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (variables, meta).  Arrays come back as numpy; feed them to
    ``model.apply`` directly or restore into an existing pytree."""
    with open(path, "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return variables, meta


def exists(path: str) -> bool:
    return os.path.exists(path)


def save_train_state(path: str, state, epoch: int, rng,
                     extra: Optional[Dict[str, Any]] = None) -> None:
    """Atomic FULL-training-state autosave: params + batch_stats +
    opt_state + step counter + epoch + RNG key (+ loop bookkeeping in
    ``extra``) — enough to resume mid-run after preemption or a crash,
    unlike ``save_checkpoint`` which persists only the variables.  The
    reference has no equivalent (its only resilience is stage-level skip,
    SURVEY.md §5); this is the elastic-recovery subsystem the rebuild
    adds.  Write is tmp-then-rename so a mid-write kill never corrupts an
    existing autosave."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_state = jax.tree_util.tree_map(np.asarray, state)
    payload = {
        "state": serialization.to_state_dict(host_state),
        "epoch": int(epoch),
        "rng": np.asarray(rng),
        "extra": serialization.to_state_dict(extra or {}),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def load_train_state(path: str, template_state):
    """Restore an autosave into ``template_state``'s structure.  Returns
    (state, epoch, rng, extra)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(template_state, payload["state"])
    rng = jax.numpy.asarray(payload["rng"], dtype=jax.numpy.uint32)
    return state, int(payload["epoch"]), rng, payload.get("extra", {})


def load_core_into(variables: Dict[str, Any],
                   pretrained: Dict[str, Any]) -> Dict[str, Any]:
    """Graft a pretrained model's ``core`` subtree (params + batch_stats)
    into freshly-initialized fine-tune/domain-adapt variables — the analog
    of the reference loading the whole pickled Mainmodel and calling its
    ``extract_features`` (models.py:422, 118).  Fresh heads keep their
    init."""
    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy

    def graft(dst, src):
        dst = dict(dst)
        for k, v in src.items():
            if k == "core":
                dst["core"] = v
        return dst

    out = dict(out)
    for col in ("params", "batch_stats"):
        if col in variables and col in pretrained and \
                "core" in pretrained[col]:
            out[col] = graft(variables[col], pretrained[col])
    return out
