"""Per-block adapter ablation study (evaluate_depth_layer.py:353-417).

The reference disables each of the 48 encoder blocks' adapters in turn
(`blk.test_id = -1`) and logs AbsRel/a1 per block — the "progressive"
layer-importance analysis behind PPEA-Depth. Functionally, disabling an
adapter == zeroing its output, and every adapter ends in a projection
(D_fc2) whose params fully gate the output; so here each ablation is a
pure param-tree edit (zero that block's adapter D_fc2) — no model
surgery, no recompilation (same jitted eval, different params).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import traverse_util


def adapter_block_paths(params: Dict, submodule: str) -> List[Tuple[str, ...]]:
    """Distinct block prefixes under `submodule` that own an adapter
    ('adapter' or 'mlp_adapter' child), in (stage, block) order."""
    flat = traverse_util.flatten_dict(params)
    blocks = set()
    for key in flat:
        if key[0] != submodule:
            continue
        for i, part in enumerate(key):
            if part in ("adapter", "mlp_adapter"):
                blocks.add(key[: i + 1])
                break
    def sort_key(path):
        nums = []
        for p in path:
            if "_" in p and p.rsplit("_", 1)[-1].isdigit():
                nums.append(int(p.rsplit("_", 1)[-1]))
        return nums
    return sorted(blocks, key=sort_key)


def zero_adapter(params: Dict, block_path: Tuple[str, ...]) -> Dict:
    """Return params with the given adapter's output projection zeroed."""
    flat = dict(traverse_util.flatten_dict(params))
    hit = False
    for key in list(flat):
        if key[: len(block_path)] == block_path and "D_fc2" in key:
            flat[key] = jnp.zeros_like(flat[key])
            hit = True
    if not hit:  # conv-conv adapters gate through D_fc2 too; D_fc1-gated
        for key in list(flat):
            if key[: len(block_path)] == block_path and "D_fc1" in key:
                flat[key] = jnp.zeros_like(flat[key])
    return traverse_util.unflatten_dict(flat)


def run_block_ablation(
    eval_fn: Callable[[Dict], np.ndarray],
    params: Dict,
    submodules=("encoder", "mono_encoder"),
    out_path: str = "repl.txt",
):
    """eval_fn(params) -> mean_errors[7]. Writes one line per ablated
    block: '<block> <abs_rel> <a1>' (evaluate_depth_layer.py:406-417)."""
    results = []
    with open(out_path, "w") as f:
        for sub in submodules:
            for block in adapter_block_paths(params, sub):
                errors = eval_fn(zero_adapter(params, block))
                name = "/".join(block)
                line = f"{name} {errors[0]:.5f} {errors[4]:.5f}"
                f.write(line + "\n")
                f.flush()
                results.append((name, errors))
    return results
