#!/usr/bin/env python
"""Probe: depthwise LK conv as a MASKED GROUPED conv.

XLA lowers depthwise (feature_group_count=C) at 3.6-6.8 TF/s useful on
these shapes (tools/probe_banded.py). A grouped conv with group size g
(feature_group_count=C/g, rhs [k,k,g,C], diagonal-masked so semantics
are exactly depthwise) spends g x the FLOPs but may ride XLA's denser
conv emitters. Sweep g per RepLKNet-31B deploy stage shape.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_grouped.py
"""

import glob
import gzip
import json
import os
import sys
import tempfile


STAGES = [  # (B, H, W, C, k)
    (8, 48, 160, 128, 31),
    (8, 24, 80, 256, 29),
    (8, 12, 40, 512, 27),
    (8, 6, 20, 1024, 13),
]
GROUPS = [1, 4, 8, 16, 32]


def device_ms(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="grp_probe")
    jax.profiler.start_trace(tmp)
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(f"{tmp}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    tot = 0.0
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("name", "").startswith("jit"):
            tot += e.get("dur", 0)
    return tot / 1e3 / iters


def main():
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    rng = np.random.RandomState(0)
    for (B, H, W, C, k) in STAGES:
        half = k // 2
        x = jnp.asarray(
            (rng.rand(B, H, W, C) - 0.5).astype(np.float32)
        ).astype(jnp.bfloat16)
        Kw = rng.randn(k, k, C).astype(np.float32) * 0.05

        results = {"shape": [B, H, W, C], "k": k}
        ref = None
        for g in GROUPS:
            if C % g:
                continue
            # rhs [k, k, g, C]: output channel c reads input channels of
            # its group; mask keeps only its own lane (depthwise exact)
            w = np.zeros((k, k, g, C), np.float32)
            for c in range(C):
                w[:, :, c % g, c] = Kw[:, :, c]
            wj = jnp.asarray(w).astype(jnp.bfloat16)

            def conv(x, w, g=g):
                return lax.conv_general_dilated(
                    x, w, (1, 1), [(half, half), (half, half)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=C // g)

            fn = jax.jit(conv)
            print(f"compiling {H}x{W}x{C} k={k} g={g}...", file=sys.stderr)
            o = np.asarray(fn(x, wj), np.float32)
            if ref is None:
                ref = o
                err = 0.0
            else:
                err = float(
                    np.abs(o - ref).max() / (np.abs(ref).max() + 1e-6))
            t = device_ms(fn, x, wj)
            useful = 2 * B * H * W * C * k * k / 1e12
            results[f"g{g}_ms"] = round(t, 3)
            results[f"g{g}_tfs_useful"] = round(useful / (t / 1e3), 2)
            if err > 1e-6:
                results[f"g{g}_err"] = err
        print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
