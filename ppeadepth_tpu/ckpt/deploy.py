"""Deploy-time structural re-parameterisation (replknet.py:309-312).

Walks a param/batch_stats tree, folds BN into every ReparamLargeKernelConv
and merges the parallel small-kernel branch into the large kernel —
producing the tree for a `merged=True` model (single biased depthwise
conv per block, no small_conv, no lkb BNs). Inference-only: the merged
form drops the small-conv pass and its BN (and lets XLA see one conv).
"""

from __future__ import annotations

from typing import Dict, Tuple

from flax import traverse_util

from ..kernels.lk_conv import merge_reparam_kernels


def structural_reparam(params: Dict, batch_stats: Dict) -> Tuple[Dict, Dict]:
    """Returns (merged_params, merged_batch_stats) for merged=True models."""
    flat_p = dict(traverse_util.flatten_dict(params))
    flat_s = dict(traverse_util.flatten_dict(batch_stats))

    # find every ReparamLKConv: a path prefix ending in 'large_kernel'
    prefixes = set()
    for key in flat_p:
        for i, part in enumerate(key):
            if part == "large_kernel":
                prefixes.add(key[: i + 1])

    for pre in prefixes:
        def p(*suffix):
            return pre + suffix

        lk_kernel = flat_p.pop(p("lkb_origin", "conv", "kernel"))
        lk_bn = {
            "scale": flat_p.pop(p("lkb_origin", "bn", "scale")),
            "bias": flat_p.pop(p("lkb_origin", "bn", "bias")),
            "mean": flat_s.pop(p("lkb_origin", "bn", "mean")),
            "var": flat_s.pop(p("lkb_origin", "bn", "var")),
        }
        small_kernel = small_bn = None
        if p("small_conv", "conv", "kernel") in flat_p:
            small_kernel = flat_p.pop(p("small_conv", "conv", "kernel"))
            small_bn = {
                "scale": flat_p.pop(p("small_conv", "bn", "scale")),
                "bias": flat_p.pop(p("small_conv", "bn", "bias")),
                "mean": flat_s.pop(p("small_conv", "bn", "mean")),
                "var": flat_s.pop(p("small_conv", "bn", "var")),
            }
        eq_k, eq_b = merge_reparam_kernels(
            lk_kernel, lk_bn, small_kernel, small_bn
        )
        flat_p[p("lkb_reparam", "kernel")] = eq_k
        flat_p[p("lkb_reparam", "bias")] = eq_b

    return (
        traverse_util.unflatten_dict(flat_p),
        traverse_util.unflatten_dict(flat_s),
    )


def banded_tables(merged_params: Dict, input_hw, stages=(0, 1),
                  dtype=None) -> Dict:
    """Build the 'banded' variable collection for a merged param tree.

    For every `lkb_reparam/kernel` under an encoder stage in `stages`,
    precompute the banded (Toeplitz) weight table
    kernels/banded_conv.build_T_t at that stage's feature width
    (input_W / 4 / 2**stage) — the deploy-time weight transform for the
    MXU banded depthwise kernel, mirroring how this function's BN-fold
    is itself a deploy-time weight transform. Tables are resolution-
    bound: DepthwiseConv falls back to lax when shapes don't match.

    Returns a tree shaped like the params tree with a 'T' leaf per
    banded conv — pass as variables={'banded': ...} alongside params.
    """
    import jax.numpy as jnp

    from ..kernels.banded_conv import build_T_t

    if dtype is None:
        dtype = jnp.bfloat16
    flat_p = traverse_util.flatten_dict(merged_params)
    out = {}
    for key, val in flat_p.items():
        if key[-2:] != ("lkb_reparam", "kernel"):
            continue
        stage = next(
            (int(part[7:]) for part in key
             if part.startswith("stages_")), None)
        if stage is None or stage not in stages:
            continue
        W = input_hw[1] // (4 * 2 ** stage)
        if W % 8:
            continue
        out[key[:-1] + ("T",)] = build_T_t(val, W).astype(dtype)
    return traverse_util.unflatten_dict(out)
