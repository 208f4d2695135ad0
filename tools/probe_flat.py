#!/usr/bin/env python
"""On-device probe: DENSE-FLAT per-channel matmul for stage-2/3 LK convs.

At stage 2 of RepLKNet-31B @ 640x192 the depthwise conv is 27x27 on a
12x40 map: k >= H, so every output pixel depends on every input row and
the per-channel conv is EXACTLY one dense [HW, HW] matmul (the flattened
zero-padded Toeplitz operator is fully dense). Dense-flat spends
H*W/k^2 = 480/729 = 0.66x the conv's nominal FLOPs and fills the MXU
lane axis (480 -> 512 lanes vs the banded row form's 40 -> 128 3.2x
padding that made stages 2-3 lose, BENCHMARKS.md). This probe measures
whether the batched matmul beats XLA's depthwise emitters at those
shapes before integrating it as a deploy backend.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_flat.py

Per shape: correctness vs the lax conv (bf16) + profiler device time.
Reference op: replknet.py:15-37.
"""

import functools
import glob
import gzip
import json
import os
import sys
import tempfile

STAGES = [  # (B, H, W, C, k)  RepLKNet-31B deploy stages 2-3 @ 640x192
    (8, 12, 40, 512, 27),
    (8, 6, 20, 1024, 13),
    (1, 12, 40, 512, 27),   # serving latency shape
    (8, 24, 80, 256, 29),   # stage 1: is flat ALSO better than banded?
]


def device_ms(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="flatprobe")
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
        HW = H * W
        x = jnp.asarray(
            (rng.rand(B, H, W, C) - 0.5).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, k, 1, C).astype(np.float32) * 0.05)

        # T_flat [C, HW, HW] from the banded row tables via the H-axis
        # diagonal indicator (einsum, no gather):
        #   Tf[c, hi*W+wi, ho*W+wo] = Trow[c, hi-ho+half, wi, wo] on band
        def build_flat(w):
            Trow = banded_conv.build_T(w, W).reshape(C, k, W, W)
            hi = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
            ho = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
            D2 = (
                (hi - ho + half)[:, :, None] == jnp.arange(k)[None, None, :]
            ).astype(Trow.dtype)  # [H, H, k]
            Tf = jnp.einsum("hod,cdiw->chiow", D2, Trow)
            return Tf.reshape(C, HW, HW)

        Tf = jax.jit(build_flat)(w).astype(jnp.bfloat16)
        tbytes = Tf.size * 2
        print(f"\n== B{B} H{H} W{W} C{C} k{k}  T_flat {tbytes/1e6:.0f} MB")

        lax_fn = jax.jit(
            lambda x, w: lk_conv._depthwise_lax(x, w.astype(x.dtype), 1, half))
        o_l = np.asarray(lax_fn(x, w), np.float32)
        t_l = device_ms(lax_fn, x, w)
        useful = 2 * B * H * W * C * k * k / 1e12
        print(f"  lax   {t_l:7.3f} ms  {useful/t_l*1e3:6.2f} TF/s useful")

        def flat_fn(x, Tf):
            xf = jnp.transpose(x, (3, 0, 1, 2)).reshape(C, B, HW)
            y = jax.lax.dot_general(
                xf, Tf, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return jnp.transpose(
                y.reshape(C, B, H, W), (1, 2, 3, 0)).astype(x.dtype)

        flat_j = jax.jit(flat_fn)
        o_f = np.asarray(flat_j(x, Tf), np.float32)
        rel = np.abs(o_f - o_l).max() / max(np.abs(o_l).max(), 1e-6)
        t_f = device_ms(flat_j, x, Tf)
        spent = 2 * B * HW * HW * C / 1e12
        print(f"  flat  {t_f:7.3f} ms  {useful/t_f*1e3:6.2f} TF/s useful "
              f"({spent/t_f*1e3:6.2f} spent)  rel_err {rel:.2e}  "
              f"speedup {t_l/t_f:.2f}x  stream-bound "
              f"{tbytes/819e9*1e3:.3f} ms")


if __name__ == "__main__":
    sys.exit(main())
