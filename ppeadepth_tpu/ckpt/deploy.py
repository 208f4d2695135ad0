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
