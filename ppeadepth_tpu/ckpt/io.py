"""Checkpoint save/load.

Mirrors the reference's artifact set (trainer.py:1290-1321, 1346-1381):
  model.msgpack  — full param tree + batch_stats (frozen backbone included,
                   like the reference's single model.pth state_dict)
  adam.msgpack   — optimizer state over the trainable partition
  track.json     — {height, width, min_depth_bin, max_depth_bin, step}
  opt.json       — config snapshot (trainer.py:1272-1281)

Serialisation is flax msgpack (host-cpu arrays): simple, dependency-free,
and layout-stable for the torch->jax importer to target the same tree.
Loading is strict=False-like: `restore_params` merges whatever paths exist
in the file into the template and reports missing/unexpected keys.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np
from flax import serialization, traverse_util


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(folder: str, state, opt, frozen_f32=None) -> None:
    """frozen_f32: optional flat {path-tuple: np.float32 array} pristine
    copy of the frozen partition — overlaid so checkpoints store f32
    even when the live state holds bf16 frozen leaves (--frozen_bf16)."""
    os.makedirs(folder, exist_ok=True)
    params = state.params
    if frozen_f32:
        flat = traverse_util.flatten_dict(params)
        flat.update(frozen_f32)
        params = traverse_util.unflatten_dict(flat)
    model_blob = serialization.msgpack_serialize(
        {"params": _to_host(params),
         "batch_stats": _to_host(state.batch_stats)}
    )
    with open(os.path.join(folder, "model.msgpack"), "wb") as f:
        f.write(model_blob)
    with open(os.path.join(folder, "adam.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(
            _to_host(serialization.to_state_dict(state.opt_state))
        ))
    with open(os.path.join(folder, "track.json"), "w") as f:
        json.dump(
            {
                "height": opt.height,
                "width": opt.width,
                "min_depth_bin": float(state.min_depth_bin),
                "max_depth_bin": float(state.max_depth_bin),
                "step": int(state.step),
            },
            f,
        )
    with open(os.path.join(folder, "opt.json"), "w") as f:
        json.dump(dataclasses.asdict(opt), f, indent=2)


def merge_into(template: Dict, loaded: Dict) -> Tuple[Dict, list, list]:
    """strict=False merge: paths present in both are taken from `loaded`
    (shape-checked); returns (merged, missing_in_loaded, unexpected)."""
    flat_t = traverse_util.flatten_dict(template)
    flat_l = traverse_util.flatten_dict(loaded)
    merged = {}
    missing, unexpected = [], []
    for k, v in flat_t.items():
        if k in flat_l and flat_l[k].shape == v.shape:
            merged[k] = flat_l[k].astype(v.dtype)
        else:
            merged[k] = v
            missing.append("/".join(map(str, k)))
    for k in flat_l:
        if k not in flat_t:
            unexpected.append("/".join(map(str, k)))
    return traverse_util.unflatten_dict(merged), missing, unexpected


def load_model(folder: str, template_params: Dict,
               template_stats: Dict):
    """Returns (params, batch_stats, track_dict)."""
    with open(os.path.join(folder, "model.msgpack"), "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    params, miss_p, unex_p = merge_into(template_params, blob["params"])
    stats, miss_s, unex_s = merge_into(
        template_stats, blob.get("batch_stats", {})
    )
    if miss_p or unex_p:
        print(f"[ckpt] params: {len(miss_p)} missing, "
              f"{len(unex_p)} unexpected keys (strict=False merge)")
    track = {}
    track_path = os.path.join(folder, "track.json")
    if os.path.exists(track_path):
        with open(track_path) as f:
            track = json.load(f)
    return params, stats, track


def load_adam(folder: str, template_opt_state: Any):
    path = os.path.join(folder, "adam.msgpack")
    if not os.path.exists(path):
        return template_opt_state
    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    try:
        return serialization.from_state_dict(template_opt_state, blob)
    except Exception as e:  # fall back to fresh state (trainer.py:1373-1381)
        print(f"[ckpt] could not restore optimizer state ({e}); "
              "starting from fresh Adam state")
        return template_opt_state
