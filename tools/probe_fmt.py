#!/usr/bin/env python
"""On-device probe: where do the banded-train data-formatting ms live?

The banded LK training backend grew the step's data-formatting bucket
20 -> 49 ms (BENCHMARKS.md). Two candidate owners, measured standalone
here at the train shapes (B=12):

  1. boundary transposes: NHWC -> H-major [C, (H+k-1)*B, W] in
     banded_depthwise and back (2 per kernel invocation, 16
     invocations/step incl. the bwd dx path);
  2. table-build relayout: the PRE-fix build_T_t_mm emitted one
     [k, C, W_o, W_i] dot then transposed to [C, W_o, k*W_i] (203 MB at
     stage 0, 2 builds per conv per step incl. the flipped bwd table).
     The fix landed: build_T_t_mm now stacks per-dy dots directly into
     the standard layout, and `build_dot_only` below reproduces the OLD
     single-dot form so the before/after delta stays measurable.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_fmt.py
"""

import glob
import gzip
import json
import os
import sys
import tempfile

STAGES = [  # (B, H, W, C, k) training shapes
    (12, 48, 160, 128, 31),
    (12, 24, 80, 256, 29),
]


def device_ms(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="fmtprobe")
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

    from ppeadepth_tpu.kernels import banded_conv

    rng = np.random.RandomState(0)
    for (B, H, W, C, k) in STAGES:
        half = k // 2
        x = jnp.asarray(
            (rng.rand(B, H, W, C) - 0.5).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, k, 1, C).astype(np.float32) * 0.05)
        g = x  # cotangent-shaped

        mb = x.size * 2 / 1e6
        print(f"\n== B{B} H{H} W{W} C{C} k{k}  x {mb:.1f} MB")

        # 1a. input boundary: pad + NHWC -> [C, Hp*B, W] (+ tail rows)
        def fwd_in(x):
            xp = jnp.pad(x, ((0, 0), (half, half), (0, 0), (0, 0)))
            tail = 8 if any((dy * B) % 8 for dy in range(k)) else 0
            xh = jnp.transpose(xp, (3, 1, 0, 2)).reshape(
                C, (H + k - 1) * B, W)
            if tail:
                xh = jnp.pad(xh, ((0, 0), (0, tail), (0, 0)))
            return xh

        t = device_ms(jax.jit(fwd_in), x)
        traffic = 2 * x.size * 2 / 1e9  # r+w GB (pad regions ~small)
        print(f"  in  pad+transpose  {t:7.3f} ms  {traffic/t*1e3:6.0f} GB/s")

        # 1b. output boundary: [C, H*B, W] -> NHWC
        y = jnp.zeros((C, H * B, W), jnp.bfloat16)

        def fwd_out(y):
            return jnp.transpose(y.reshape(C, H, B, W), (2, 1, 3, 0))

        t = device_ms(jax.jit(fwd_out), y)
        print(f"  out transpose      {t:7.3f} ms  {traffic/t*1e3:6.0f} GB/s")

        # 2. table build, split into dot vs final transpose
        def build_full(w):
            return banded_conv.build_T_t_mm(w, W, jnp.bfloat16)

        def build_dot_only(w):
            # the dot that produces [k, C, W_o*W_i], WITHOUT the
            # [C, W_o, k*W_i] relayout
            kk = k
            halfk = kk // 2
            wo = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
            wi = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
            d_oi = (wi - wo + halfk)[None, :, :] == jnp.arange(kk)[
                :, None, None]
            D = d_oi.astype(jnp.bfloat16).reshape(kk, W * W)
            krows = w.astype(jnp.bfloat16)[:, :, 0, :]
            return jax.lax.dot_general(
                krows, D, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16)

        tbytes = C * k * W * W * 2 / 1e9
        t_full = device_ms(jax.jit(build_full), w)
        t_dot = device_ms(jax.jit(build_dot_only), w)
        print(f"  build full         {t_full:7.3f} ms  "
              f"(table {tbytes*1e3:.0f} MB)")
        print(f"  build dot only     {t_dot:7.3f} ms  -> transpose adds "
              f"{t_full-t_dot:7.3f} ms  "
              f"{2*tbytes/max(t_full-t_dot,1e-9)*1e3:6.0f} GB/s")

        # 3. whole differentiable conv fwd+bwd for scale
        f = jax.jit(jax.value_and_grad(
            lambda x: banded_conv.banded_depthwise_train(
                x, w, k).astype(jnp.float32).sum()))
        t = device_ms(f, x)
        print(f"  banded train f+b   {t:7.3f} ms   (incl. 2 builds)")


if __name__ == "__main__":
    sys.exit(main())
