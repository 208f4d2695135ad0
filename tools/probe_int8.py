#!/usr/bin/env python
"""Probe: does int8 double the MXU throughput of the ops that dominate
the deploy forward (v5e peak: 394 int8 TOPS vs 197 bf16 TF/s)?

Times, on the real chip (profiler device time, not wall-clock):
  1. the stage-0 merged large-kernel depthwise conv (31x31, C=128,
     48x160 spatial at 640x192 input) in f32 / bf16 / int8 operands;
  2. a ConvFFN-shaped dense matmul ([B*HW, C] @ [C, 4C]) in bf16 / int8.

If int8 depthwise lands near 2x bf16, a post-training-quantized deploy
path can beat the measured bf16 block-diagonal ceiling
(kernels/README.md) by algorithm-independent operand narrowing.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_int8.py
"""

import collections
import glob
import gzip
import json
import os
import tempfile


def _device_ms(run, iters=8):
    import jax

    tmp = tempfile.mkdtemp(prefix="probe_int8")
    jax.profiler.start_trace(tmp)
    for i in range(iters):
        out = run(i)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(f"{tmp}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    durs = collections.Counter()
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and e.get(
                "name", "").startswith("jit"):
            durs[e["name"]] += e["dur"]
    return durs.most_common(1)[0][1] / 1e3 / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, H, W, C, K = 8, 48, 160, 128, 31
    rng = np.random.RandomState(0)
    x_f = rng.rand(B, H, W, C).astype(np.float32)
    w_f = rng.rand(K, K, 1, C).astype(np.float32)
    x_i = (x_f * 127).astype(np.int8)
    w_i = (w_f * 127).astype(np.int8)

    dn = lax.conv_dimension_numbers(x_f.shape, w_f.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    results = {}

    def dw(x, w, acc):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=C, preferred_element_type=acc)

    flops = 2 * B * H * W * C * K * K
    for tag, (x, w, acc) in {
        "dw_f32": (x_f, w_f, jnp.float32),
        "dw_bf16": (x_f.astype(jnp.bfloat16), w_f.astype(jnp.bfloat16),
                    jnp.float32),
        "dw_int8": (x_i, w_i, jnp.int32),
    }.items():
        xd, wd = jnp.asarray(x), jnp.asarray(w)
        fn = jax.jit(lambda a, b: dw(a, b, acc))
        try:
            jax.block_until_ready(fn(xd, wd))
            ms = _device_ms(lambda i: fn(xd, wd))
            results[tag] = round(ms, 3)
            print(f"{tag}: {ms:.3f} ms  ({flops / ms / 1e9:.2f} TF/s)")
        except Exception as e:  # noqa: BLE001
            results[tag] = f"fail: {type(e).__name__}"
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")

    # ConvFFN-shaped dense matmul: stage-2 shape [B*HW, C2] @ [C2, 4*C2]
    M, C2 = B * 24 * 80, 512
    a_f = rng.rand(M, C2).astype(np.float32)
    b_f = rng.rand(C2, 4 * C2).astype(np.float32)
    mm_flops = 2 * M * C2 * 4 * C2
    for tag, (a, b, acc) in {
        "mm_bf16": (a_f.astype(jnp.bfloat16), b_f.astype(jnp.bfloat16),
                    jnp.float32),
        "mm_int8": ((a_f * 127).astype(np.int8), (b_f * 127).astype(np.int8),
                    jnp.int32),
    }.items():
        ad, bd = jnp.asarray(a), jnp.asarray(b)
        fn = jax.jit(lambda p, q: lax.dot_general(
            p, q, (((1,), (0,)), ((), ())), preferred_element_type=acc))
        try:
            jax.block_until_ready(fn(ad, bd))
            ms = _device_ms(lambda i: fn(ad, bd))
            results[tag] = round(ms, 3)
            print(f"{tag}: {ms:.3f} ms  ({mm_flops / ms / 1e9:.2f} TF/s)")
        except Exception as e:  # noqa: BLE001
            results[tag] = f"fail: {type(e).__name__}"
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
