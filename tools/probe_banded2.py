#!/usr/bin/env python
"""On-device probe: kernels/banded_conv.py vs the lax depthwise conv.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_banded2.py

Per RepLKNet-31B deploy stage shape: correctness vs lax (bf16) and
profiler device time. Go/no-go for integrating the banded backend.
"""

import functools
import glob
import gzip
import json
import os
import sys
import tempfile

STAGES = [  # (B, H, W, C, k)
    (8, 48, 160, 128, 31),
    (8, 24, 80, 256, 29),
]
N_ACCS = (4,)
TRANSPOSED = (False, True)


def device_ms(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="banded2")
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
    import jax.numpy as jnp
    import numpy as np

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from ppeadepth_tpu.kernels import banded_conv, lk_conv

    rng = np.random.RandomState(0)
    for (B, H, W, C, k) in STAGES:
        half = k // 2
        x = jnp.asarray(
            (rng.rand(B, H, W, C) - 0.5).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.randn(k, k, 1, C).astype(np.float32) * 0.05)

        T = jax.jit(banded_conv.build_T, static_argnums=1)(
            w, W).astype(jnp.bfloat16)

        lax_fn = jax.jit(
            lambda x, w: lk_conv._depthwise_lax(x, w.astype(x.dtype), 1, half))
        o_l = np.asarray(lax_fn(x, w), np.float32)
        t_l = device_ms(lax_fn, x, w)
        useful = 2 * B * H * W * C * k * k / 1e12
        Tt = jax.jit(banded_conv.build_T_t, static_argnums=1)(
            w, W).astype(jnp.bfloat16)
        for _ in N_ACCS:
            for transposed in TRANSPOSED:
                tw = Tt if transposed else T
                ban_fn = jax.jit(functools.partial(
                    banded_conv.banded_depthwise, k=k))
                print(f"compiling {H}x{W}x{C} k={k} "
                      f"tT={transposed}...", file=sys.stderr)
                try:
                    o_b = np.asarray(ban_fn(x, tw), np.float32)
                except Exception as e:
                    print(json.dumps({"shape": [B, H, W, C], "k": k,
                                      "tT": transposed,
                                      "error": str(e)[:300]}), flush=True)
                    continue
                err = float(
                    np.abs(o_b - o_l).max() / (np.abs(o_l).max() + 1e-6))
                t_b = device_ms(ban_fn, x, tw)
                print(json.dumps({
                    "shape": [B, H, W, C], "k": k,
                    "tT": transposed,
                    "banded_ms": round(t_b, 3), "lax_ms": round(t_l, 3),
                    "speedup": round(t_l / t_b, 2), "err": err,
                    "banded_tfs_useful": round(useful / (t_b / 1e3), 2),
                    "T_mb": round(tw.size * 2 / 1e6, 1),
                }), flush=True)


if __name__ == "__main__":
    main()
