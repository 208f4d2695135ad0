#!/usr/bin/env python
"""Probe XLA's batched-matmul rate for the banded-conv shapes.

tools/probe_banded.py measured 'bchK,cKv->bchv' at 3-25 TF/s raw. This
isolates whether that is a layout artifact: time the canonical batched
matmul 'cmk,ckn->cmn' (batch-leading, M contiguous) at the per-channel
banded shapes, padded and row-packed variants, to find the best rate
XLA can reach — the go/no-go number for a pallas banded kernel.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_bmm.py
"""

import glob
import gzip
import json
import os
import sys
import tempfile

# (C, M, K, N, note)
CASES = [
    (128, 384, 4960, 160, "stage0 banded im2col"),
    (128, 96, 5440, 640, "stage0 4-row-packed"),
    (128, 384, 4992, 256, "stage0 padded to tiles"),
    (256, 192, 2320, 80, "stage1 banded im2col"),
    (256, 64, 2480, 240, "stage1 3-row-packed"),
    (512, 96, 1080, 40, "stage2 banded im2col"),
    (512, 32, 1200, 120, "stage2 3-row-packed"),
    (1, 49152, 4960, 160, "stage0 if weights were shared (M=C*B*H)"),
]


def device_ms(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="bmm_probe")
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

    rng = np.random.RandomState(0)
    for (C, M, K, N, note) in CASES:
        a = jnp.asarray(rng.rand(C, M, K).astype(np.float32) - 0.5
                        ).astype(jnp.bfloat16)
        b = jnp.asarray(rng.rand(C, K, N).astype(np.float32) - 0.5
                        ).astype(jnp.bfloat16)

        def mm(a, b):
            return jnp.einsum(
                "cmk,ckn->cmn", a, b,
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        fn = jax.jit(mm)
        print(f"compiling {note}...", file=sys.stderr)
        fn(a, b)
        t = device_ms(fn, a, b)
        raw = 2 * C * M * K * N / 1e12
        gb = (a.size + b.size) * 2 / 1e9
        print(json.dumps({
            "note": note, "CMKN": [C, M, K, N],
            "ms": round(t, 3), "tfs_raw": round(raw / (t / 1e3), 1),
            "operand_gb": round(gb, 2),
            "hbm_bound_ms_at_800gbs": round(gb / 0.8, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
