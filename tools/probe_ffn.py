"""Probe: can a pallas fused-FFN kernel beat XLA's ConvFFN fusion?

Round-3 finding: in the merged teacher forward, each ConvFFN
(1x1 conv C->4C, BN+GELU, 1x1 conv 4C->C — replknet.py ConvFFN,
reference replknet_adapter.py:181-214) compiles to ONE kOutput fusion
(e.g. fusion.1585) that runs at ~29 TF/s — 7% of the v5e bf16 MXU peak
for what is two dense [M,C]@[C,4C] matmuls. With ~24 ConvFFN blocks in
RepLKNet-31B this caps the inference headline. This probe measures, at
the stage-0 shape [8*48*160, 128]:

  1. the XLA path (exactly the model's math, standalone jit)
  2. a pallas kernel: W1/W2 VMEM-resident, M-tiled, intermediate in
     VMEM (never HBM), erf-GELU on the VPU, bf16 MXU operands with f32
     accumulation.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_ffn.py
       [--m_tile 512] [--c 128] [--spatial 61440] [--iters 20]
"""

import argparse
import functools
import glob
import gzip
import json
import os
import sys
import tempfile


def device_ms(fn, args, iters):
    import collections

    import jax
    import numpy as np

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="probe_ffn")
    jax.profiler.start_trace(tmp)
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out[0, :4] if out.ndim > 1 else out)
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(f"{tmp}/plugins/profile/*/*.trace.json.gz"))
    durs = collections.Counter()
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and e.get("name", "").startswith("jit_"):
            durs[e["name"]] += e["dur"]
    name, us = durs.most_common(1)[0]
    return us / 1e3 / iters, name


def make_pallas_ffn(M, C, H4, TM, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        x = x_ref[...]  # [TM, C] bf16
        h = jax.lax.dot_general(
            x, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [TM, 4C] f32
        h = h + b1_ref[...].astype(jnp.float32)
        # Mosaic lowers neither erfc nor erf: use tanh-GELU, whose max
        # deviation from exact erf-GELU (~3e-3 absolute near |x|~2) is
        # below the bf16 quantization of the intermediate (~8e-3)
        h = 0.5 * h * (1.0 + jnp.tanh(
            0.7978845608028654 * (h + 0.044715 * h * h * h)))
        y = jax.lax.dot_general(
            h.astype(jnp.bfloat16), w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = (y + b2_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, C), lambda m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H4), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H4, C), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda m: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, C), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--c", type=int, default=128)
    p.add_argument("--spatial", type=int, default=8 * 48 * 160)
    p.add_argument("--m_tile", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    import jax.numpy as jnp
    import numpy as np

    C, M, H4 = args.c, args.spatial, 4 * args.c
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, C).astype(np.float32), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(C, H4).astype(np.float32) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(1, H4).astype(np.float32) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(H4, C).astype(np.float32) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(1, C).astype(np.float32) * 0.1, jnp.bfloat16)

    @jax.jit
    def xla_ffn(x, w1, b1, w2, b2):
        h = jnp.dot(x, w1) + b1
        h = jax.nn.gelu(h, approximate=False)
        return (jnp.dot(h, w2) + b2).astype(jnp.bfloat16)

    pallas_ffn = jax.jit(make_pallas_ffn(M, C, H4, args.m_tile))

    ref = xla_ffn(x, w1, b1, w2, b2)
    out = pallas_ffn(x, w1, b1, w2, b2)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"max abs diff {err:.4f} vs scale {scale:.2f} "
          f"(rel {err / scale:.2e})")

    flops = 2 * M * C * H4 * 2
    for name, fn in (("xla", xla_ffn), ("pallas", pallas_ffn)):
        ms, prog = device_ms(fn, (x, w1, b1, w2, b2), args.iters)
        print(f"{name:7s} {ms:7.3f} ms  {flops / ms / 1e9:8.1f} GF/s  ({prog})")


if __name__ == "__main__":
    main()
