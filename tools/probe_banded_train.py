#!/usr/bin/env python
"""On-device probe: the DIFFERENTIABLE banded LK conv (training path)
vs the lax depthwise conv, fwd and fwd+bwd(dx), at train-step shapes.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_banded_train.py

Unlike probe_banded2 (deploy: precomputed tables), this times
kernels/banded_conv.banded_depthwise_train, whose tables are REBUILT
from the conv param inside the jit every call (the frozen-backbone
training contract: no persistent table HBM; build is a small matmul +
one layout copy). Train batch is 12 — B % 8 == 4 exercises the
offset-4 residue-class accumulators. d/dw is exact but dead code here
(we only pull the x cotangent, like a frozen backbone does).
"""

import functools
import glob
import gzip
import json
import os
import sys
import tempfile

STAGES = [  # (B, H, W, C, k) -- bs-12 training shapes, 640x192
    (12, 48, 160, 128, 31),
    (12, 24, 80, 256, 29),
]


def device_ms(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="banded_train")
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
        x = jnp.asarray(
            (rng.rand(B, H, W, C) - 0.5).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, k, 1, C).astype(np.float32) * 0.05)
        cot = jnp.asarray(
            rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)

        def f_banded(x_, w_):
            return banded_conv.banded_depthwise_train(
                x_, w_, k, False, jnp.bfloat16)

        def f_lax(x_, w_):
            return lk_conv._depthwise_lax(x_, w_.astype(x_.dtype), 1, k // 2)

        # frozen-backbone contract: pull only the x cotangent
        def g_of(f):
            def g(x_, w_):
                y, pull = jax.vjp(lambda xx: f(xx, w_), x_)
                return jnp.sum(y.astype(jnp.float32)) + jnp.sum(
                    pull(cot)[0].astype(jnp.float32))
            return jax.jit(g)

        fb = jax.jit(f_banded)
        fl = jax.jit(f_lax)
        print(f"compiling {H}x{W}x{C} k={k} B={B}...", file=sys.stderr)
        err = float(jnp.max(jnp.abs(
            fb(x, w).astype(jnp.float32) - fl(x, w).astype(jnp.float32)
        )) / (jnp.max(jnp.abs(fl(x, w).astype(jnp.float32))) + 1e-9))
        rec = {
            "shape": [B, H, W, C], "k": k,
            "fwd_banded_ms": round(device_ms(fb, x, w), 3),
            "fwd_lax_ms": round(device_ms(fl, x, w), 3),
            "fwdbwd_banded_ms": round(device_ms(g_of(f_banded), x, w), 3),
            "fwdbwd_lax_ms": round(device_ms(g_of(f_lax), x, w), 3),
            "fwd_rel_err": round(err, 6),
        }
        rec["fwd_speedup"] = round(
            rec["fwd_lax_ms"] / rec["fwd_banded_ms"], 2)
        rec["fwdbwd_speedup"] = round(
            rec["fwdbwd_lax_ms"] / rec["fwdbwd_banded_ms"], 2)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
