#!/usr/bin/env python
"""Standalone real-TPU probe for kernels/warp_mxu.py: compile + time the
fwd and fwd+bwd warp at KITTI train shapes vs the XLA gather path.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_warp.py [--bf16]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile


def device_ms(fn, *args, iters=4):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="warp_probe")
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
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--rows", type=int, default=2)
    p.add_argument("--precision", default="default")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from ppeadepth_tpu.kernels import warp_mxu
    from ppeadepth_tpu.ops.sampling import grid_sample

    B, H, W, C = args.batch, 192, 640, 3
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    gx, gy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    base = np.stack(
        [(gx / (W - 1) - 0.5) * 2, (gy / (H - 1) - 0.5) * 2], -1
    )[None].repeat(B, 0).astype(np.float32)
    off = (rng.rand(B, H, W, 2).astype(np.float32) - 0.5) * 0.05
    coords = jnp.asarray(base + off)
    cot = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))

    mm = "bfloat16" if args.bf16 else "float32"

    @jax.jit
    def fwd_ker(c):
        return warp_mxu.grid_sample_border_mxu(img, c, False,
                                               args.precision, mm)

    @jax.jit
    def fwd_lax(c):
        return grid_sample(img, c, "border")

    @jax.jit
    def both_ker(c):
        return jax.value_and_grad(
            lambda cc: jnp.sum(warp_mxu.grid_sample_border_mxu(
                img, cc, False, args.precision, mm) * cot)
        )(c)

    @jax.jit
    def both_lax(c):
        return jax.value_and_grad(
            lambda cc: jnp.sum(grid_sample(img, cc, "border") * cot)
        )(c)

    print("compiling fwd kernel...", file=sys.stderr)
    o_k = fwd_ker(coords)
    o_l = fwd_lax(coords)
    err = float(jnp.max(jnp.abs(o_k - o_l)))
    print(f"fwd max abs err vs lax: {err:.3e}")

    print("compiling fwd+bwd kernel...", file=sys.stderr)
    (_, g_k) = both_ker(coords)
    (_, g_l) = both_lax(coords)
    gerr = float(jnp.max(jnp.abs(g_k - g_l)))
    gref = float(jnp.max(jnp.abs(g_l)))
    print(f"bwd max abs err vs lax: {gerr:.3e} (ref max {gref:.3e})")

    t_fk = device_ms(fwd_ker, coords)
    t_fl = device_ms(fwd_lax, coords)
    t_bk = device_ms(both_ker, coords)
    t_bl = device_ms(both_lax, coords)
    print(json.dumps({
        "mm_dtype": mm, "rows_per_tile": args.rows,
        "fwd_ms": {"mxu": round(t_fk, 2), "lax": round(t_fl, 2)},
        "fwd_bwd_ms": {"mxu": round(t_bk, 2), "lax": round(t_bl, 2)},
        "fwd_err": err, "bwd_err": gerr,
    }))


if __name__ == "__main__":
    main()
