#!/usr/bin/env python
"""Real-TPU probe for kernels/lk_conv_pallas.py: compile + time the
pallas depthwise conv vs the lax lowering at RepLKNet-31B stage shapes.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_lk.py [--bf16]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

STAGES = [  # (B, H, W, C, k) at 640x192 input, RepLKNet-31B
    (12, 48, 160, 128, 31),
    (12, 24, 80, 256, 29),
    (12, 12, 40, 512, 27),
    (12, 6, 20, 1024, 13),
]


def device_ms(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="lk_probe")
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
        if e.get("ph") == "X" and e.get("name", "").startswith("jit_"):
            tot += e.get("dur", 0)
    return tot / 1e3 / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from ppeadepth_tpu.kernels import lk_conv, lk_conv_pallas

    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    rng = np.random.RandomState(0)
    rows = []
    for (B, H, W, C, k) in STAGES:
        x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(dt)
        w = jnp.asarray(
            rng.randn(k, k, 1, C).astype(np.float32) * 0.05).astype(dt)

        lax_fn = jax.jit(lambda x, w: lk_conv._depthwise_lax(x, w, 1, k // 2))
        pal_fn = jax.jit(
            lambda x, w: lk_conv_pallas.depthwise_conv2d_pallas(x, w, k // 2))

        print(f"compiling stage {H}x{W}x{C} k={k}...", file=sys.stderr)
        try:
            o_p = pal_fn(x, w)
            o_l = lax_fn(x, w)
            err = float(jnp.max(jnp.abs(
                o_p.astype(jnp.float32) - o_l.astype(jnp.float32))))
            t_p = device_ms(pal_fn, x, w)
            t_l = device_ms(lax_fn, x, w)
            rows.append({"shape": [B, H, W, C], "k": k,
                         "pallas_ms": round(t_p, 3), "lax_ms": round(t_l, 3),
                         "err": err})
        except Exception as e:
            rows.append({"shape": [B, H, W, C], "k": k,
                         "error": str(e)[:200]})
        print(json.dumps(rows[-1]))
    print(json.dumps({"dtype": str(dt.__name__ if hasattr(dt, '__name__')
                                   else dt), "stages": rows}))


if __name__ == "__main__":
    main()
