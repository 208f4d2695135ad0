#!/usr/bin/env python
"""On-device probe: the full-res decoder tail's layout copies.

Round-5 attribution: ~16 ms/step of the data-formatting bucket are
copies AROUND the scale-0 decoder convs (upconvs_1_4 / disp_conv at
[12,192,640,32]) — XLA lowers few-channel full-res convs in a W-minor
layout ({2,3,0,1}) while every neighbor is C-minor ({3,0,2,1}), paying
an 18 MB lane-crossing copy per operand, fwd and bwd.

Candidate: express the 3x3 conv as 9 shifted matmuls over the channel
axis (C-minor preserved end-to-end, contributions accumulated in f32
with masked shifts) — no layout flip anywhere.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_dec.py
"""

import functools
import glob
import gzip
import json
import os
import sys
import tempfile


def device_ms(fn, *args, iters=6):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="decprobe")
    jax.profiler.start_trace(tmp)
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    import numpy as np

    np.asarray(jax.tree_util.tree_leaves(out)[0])
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(f"{tmp}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    import collections

    durs = collections.Counter()
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and \
                e.get("name", "").startswith("jit"):
            durs[e["name"]] += e["dur"]
    return durs.most_common(1)[0][1] / 1e3 / iters if durs else float("nan")


def conv3x3_mm(x, kernel, bias):
    """SAME zero-pad 3x3 conv as 9 channel-matmuls with shifted adds.
    kernel: [3, 3, Cin, Cout]."""
    import jax.numpy as jnp

    B, H, W, C = x.shape
    Co = kernel.shape[-1]
    y = jnp.zeros((B, H, W, Co), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            oy0, ox0 = max(0, -dy), max(0, -dx)
            iy0, ix0 = max(0, dy), max(0, dx)
            h, w = H - abs(dy), W - abs(dx)
            part = jnp.einsum(
                "bhwc,cd->bhwd", x[:, iy0:iy0 + h, ix0:ix0 + w],
                kernel[dy + 1, dx + 1],
                preferred_element_type=jnp.float32)
            y = y.at[:, oy0:oy0 + h, ox0:ox0 + w].add(part)
    return (y + bias.astype(jnp.float32)).astype(x.dtype)


def main():
    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    import jax.numpy as jnp
    import numpy as np

    B, H, W, C = 12, 192, 640, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16)
    k1 = jnp.asarray(rng.randn(3, 3, C, C) * 0.1, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(C) * 0.1, jnp.bfloat16)
    k2 = jnp.asarray(rng.randn(3, 3, C, 1) * 0.1, jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(1) * 0.1, jnp.bfloat16)

    def tail_conv(x, k1, b1, k2, b2):
        y = jax.lax.conv_general_dilated(
            x, k1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
        y = jax.nn.elu(y)
        d = jax.lax.conv_general_dilated(
            y, k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
        return jax.nn.sigmoid(d.astype(jnp.float32))

    def tail_mm(x, k1, b1, k2, b2):
        y = jax.nn.elu(conv3x3_mm(x, k1, b1))
        d = conv3x3_mm(y, k2, b2)
        return jax.nn.sigmoid(d.astype(jnp.float32))

    out = {}
    for name, fn in (("conv", tail_conv), ("mm", tail_mm)):
        f = jax.jit(fn)

        def loss(x, k1, b1, k2, b2, f=fn):
            return jnp.sum(f(x, k1, b1, k2, b2))

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 3)))
        fwd = device_ms(f, x, k1, b1, k2, b2)
        bwd = device_ms(g, x, k1, b1, k2, b2)
        out[name] = {"fwd_ms": round(fwd, 2), "fwd_bwd_ms": round(bwd, 2)}
        print(name, out[name], file=sys.stderr)

    # value parity
    a = np.asarray(jax.jit(tail_conv)(x, k1, b1, k2, b2), np.float32)
    bb = np.asarray(jax.jit(tail_mm)(x, k1, b1, k2, b2), np.float32)
    err = np.abs(a - bb).max()
    out["max_abs_err"] = float(err)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
