#!/usr/bin/env python
"""Probe: large-kernel depthwise conv as per-channel BANDED (Toeplitz)
dense matmuls on the MXU.

The round-2 close-out (kernels/README.md) pinned XLA's depthwise
lowering at the block-diagonal MXU mapping ceiling (~3.25 TF/s useful)
and ruled out per-tap VPU kernels. This probes the reformulation that
close-out did NOT consider: for each channel c,

    Y[c, b, h, :] = sum_dy X[c, b, h+dy-half, :] @ T[c, dy]

with T[c, dy] a [W, W] banded matrix holding kernel row dy on its
k diagonals (zero-padding == truncated diagonals). Equivalently one
matmul per channel over an im2col'd window: [B*H, k*W] @ [k*W, W].
It spends W/k times more raw FLOPs but runs them at dense batched
matmul rates (measured ~157 TF/s peak on this chip, BENCHMARKS.md)
instead of 3-4 TF/s.

Variants timed per RepLKNet-31B stage shape (deploy B=8, bf16):
  lax        — XLA depthwise conv baseline (the production path)
  loop       — sum of k per-dy einsums (no im2col materialization)
  im2col     — build [B,C,H,k*W] window then one batched einsum
  mm_only    — the im2col einsum with the window PREBUILT (not timed):
               the pure matmul rate a pallas kernel would see with the
               window built in VMEM

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_banded.py
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

STAGES = [  # (B, H, W, C, k) at 640x192 input, RepLKNet-31B deploy
    (8, 48, 160, 128, 31),
    (8, 24, 80, 256, 29),
    (8, 12, 40, 512, 27),
    (8, 6, 20, 1024, 13),
]


def device_ms(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="banded_probe")
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


def build_T(K, W):
    """K [k, k, C] (dy, dx, c) -> T [k, C, W, W] banded, f32.

    T[dy, c, w_in, w_out] = K[dy, w_in - w_out + half, c].
    """
    import numpy as np

    k, _, C = K.shape
    half = k // 2
    T = np.zeros((k, C, W, W), np.float32)
    wo = np.arange(W)
    for dy in range(k):
        for dx in range(k):
            wi = wo + dx - half
            valid = (wi >= 0) & (wi < W)
            # advanced indices around the ':' slice move up front:
            # result shape is (n_valid, C)
            T[dy, :, wi[valid], wo[valid]] = K[dy, dx, :][None, :]
    return T


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from ppeadepth_tpu.kernels import lk_conv

    rng = np.random.RandomState(0)
    rows = []
    for (B, H, W, C, k) in STAGES:
        half = k // 2
        x = rng.rand(B, H, W, C).astype(np.float32) - 0.5
        Kw = (rng.randn(k, k, C).astype(np.float32) * 0.05)

        x_nhwc = jnp.asarray(x).astype(jnp.bfloat16)
        w_lax = jnp.asarray(Kw[:, :, None, :]).astype(jnp.bfloat16)
        # channel-major layout for the banded forms: W on lanes
        xc = jnp.asarray(x.transpose(0, 3, 1, 2)).astype(jnp.bfloat16)
        T = jnp.asarray(build_T(Kw, W)).astype(jnp.bfloat16)  # [k,C,W,W]
        Tf = jnp.asarray(
            np.moveaxis(build_T(Kw, W), 0, 1).reshape(C, k * W, W)
        ).astype(jnp.bfloat16)  # [C, k*W, W]

        def lax_fn(x, w):
            return lk_conv._depthwise_lax(x, w, 1, half)

        def loop_fn(xc, T):
            xp = jnp.pad(xc, ((0, 0), (0, 0), (half, half), (0, 0)))
            acc = jnp.zeros(xc.shape, jnp.float32)
            for dy in range(k):
                acc += jnp.einsum(
                    "bchw,cwv->bchv", xp[:, :, dy:dy + H, :], T[dy],
                    preferred_element_type=jnp.float32)
            return acc.astype(jnp.bfloat16)

        def win_fn(xc):
            xp = jnp.pad(xc, ((0, 0), (0, 0), (half, half), (0, 0)))
            return jnp.concatenate(
                [xp[:, :, dy:dy + H, :] for dy in range(k)], axis=-1)

        def mm_fn(xwin, Tf):
            return jnp.einsum(
                "bchK,cKv->bchv", xwin, Tf,
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def im2col_fn(xc, Tf):
            return mm_fn(win_fn(xc), Tf)

        jl = jax.jit(lax_fn)
        jloop = jax.jit(loop_fn)
        jim = jax.jit(im2col_fn)
        jmm = jax.jit(mm_fn)

        print(f"compiling {B}x{H}x{W}x{C} k={k}...", file=sys.stderr)
        o_ref = np.asarray(jl(x_nhwc, w_lax), np.float32)
        o_loop = np.asarray(jloop(xc, T), np.float32).transpose(0, 2, 3, 1)
        o_im = np.asarray(jim(xc, Tf), np.float32).transpose(0, 2, 3, 1)
        scale = np.abs(o_ref).max() + 1e-6
        err_loop = np.abs(o_loop - o_ref).max() / scale
        err_im = np.abs(o_im - o_ref).max() / scale

        xwin = jax.jit(win_fn)(xc)
        t_lax = device_ms(jl, x_nhwc, w_lax, iters=args.iters)
        t_loop = device_ms(jloop, xc, T, iters=args.iters)
        t_im = device_ms(jim, xc, Tf, iters=args.iters)
        t_mm = device_ms(jmm, xwin, Tf, iters=args.iters)

        useful = 2 * B * H * W * C * k * k / 1e12
        raw = 2 * B * H * C * (k * W) * W / 1e12
        rows.append({
            "shape": [B, H, W, C], "k": k,
            "lax_ms": round(t_lax, 3),
            "loop_ms": round(t_loop, 3),
            "im2col_ms": round(t_im, 3),
            "mm_only_ms": round(t_mm, 3),
            "err_loop": float(err_loop), "err_im2col": float(err_im),
            "lax_tfs_useful": round(useful / (t_lax / 1e3), 2),
            "mm_tfs_raw": round(raw / (t_mm / 1e3), 2),
            "T_mb": round(Tf.size * 2 / 1e6, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
