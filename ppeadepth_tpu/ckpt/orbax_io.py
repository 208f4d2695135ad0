"""Optional orbax checkpoint backend.

The default msgpack format (ckpt/io.py) is simple and layout-stable; this
backend adds production niceties for large-scale runs: async saves that
overlap training, atomic directory commits, and native support for
sharded arrays (params saved with their shardings on multi-host meshes).

Select with Trainer/env `PPEA_CKPT_BACKEND=orbax` or call directly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(folder: str, state, opt,
                    async_save: bool = False) -> Any:
    """Save params/batch_stats/opt_state via orbax + track/opt json."""
    import orbax.checkpoint as ocp

    os.makedirs(folder, exist_ok=True)
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    path = os.path.abspath(os.path.join(folder, "orbax"))
    if async_save:
        ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        ckptr.save(path, tree, force=True)
    else:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, tree, force=True)
    with open(os.path.join(folder, "track.json"), "w") as f:
        json.dump(
            {
                "height": opt.height,
                "width": opt.width,
                "min_depth_bin": float(state.min_depth_bin),
                "max_depth_bin": float(state.max_depth_bin),
                "step": int(state.step),
                "backend": "orbax",
            },
            f,
        )
    with open(os.path.join(folder, "opt.json"), "w") as f:
        json.dump(dataclasses.asdict(opt), f, indent=2)
    return ckptr


def load_checkpoint(folder: str, template_state):
    """Restore (params, batch_stats, opt_state, track) from an orbax dir."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(os.path.join(folder, "orbax")),
        item={
            "params": template_state.params,
            "batch_stats": template_state.batch_stats,
            "opt_state": template_state.opt_state,
        },
    )
    track = {}
    track_path = os.path.join(folder, "track.json")
    if os.path.exists(track_path):
        with open(track_path) as f:
            track = json.load(f)
    return (restored["params"], restored["batch_stats"],
            restored["opt_state"], track)
