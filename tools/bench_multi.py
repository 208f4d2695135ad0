#!/usr/bin/env python
"""Student (multi-frame, cost-volume) inference benchmark on the real
TPU — completes the inference picture next to bench.py's teacher fps.

Path: matching encoder (RepLKNet + adapters + plane-sweep cost volume,
`--cv_backend auto` -> the MXU pallas kernel) -> DepthDecoderV2, via the
deployment API (serve.InferenceSession.predict_depth_multi).

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_multi.py [--batch 8]
"""

import argparse
import glob
import gzip
import json
import os
import tempfile


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--rep_size", default="b")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    import jax
    import numpy as np

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from ppeadepth_tpu.options import Config
    from ppeadepth_tpu.serve import InferenceSession

    opt = Config(adapter=True, rep_size=args.rep_size, adpt_test=4,
                 height=192, width=640, compute_dtype="bfloat16")
    sess = InferenceSession(opt)

    B, H, W = args.batch, 192, 640
    rng = np.random.RandomState(0)
    img = rng.rand(B, H, W, 3).astype(np.float32)
    lookup = rng.rand(B, H, W, 3).astype(np.float32)  # previous frame
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * W / 4, 1.92 * H / 4
    K[0, 2], K[1, 2] = 0.5 * W / 4, 0.5 * H / 4
    K = np.tile(K, (B, 1, 1))
    invK = np.linalg.pinv(K[0])[None].repeat(B, 0)

    out = sess.predict_depth_multi(img, lookup, K, invK)
    assert np.isfinite(out).all()

    tmp = tempfile.mkdtemp(prefix="bench_multi")
    jax.profiler.start_trace(tmp)
    for _ in range(args.iters):
        out = sess.predict_depth_multi(img, lookup, K, invK)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(f"{tmp}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    import collections
    import sys

    tot = 0.0
    per_cat = collections.Counter()
    per_op = collections.Counter()
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            tot += e["dur"]
            continue
        args_d = e.get("args") or {}
        hlo_cat = args_d.get("hlo_category")
        if hlo_cat is None and "run_id" not in args_d:
            continue  # host-side event
        per_op[name] += e["dur"]
        per_cat[hlo_cat or name.rstrip("0123456789.")] += e["dur"]
    ms = tot / 1e3 / args.iters
    for cat, us in per_cat.most_common(12):
        print(f"  {us / 1e3 / args.iters:8.2f} ms  {cat}", file=sys.stderr)
    print("  -- top ops --", file=sys.stderr)
    for name, us in per_op.most_common(12):
        print(f"  {us / 1e3 / args.iters:8.2f} ms  {name[:90]}",
              file=sys.stderr)
    print(json.dumps({
        "metric": f"multi_frame_depth_fps_per_chip_640x192_{args.rep_size}",
        "value": round(args.batch / (ms / 1e3), 2),
        "unit": "fps/chip", "device_ms": round(ms, 2), "batch": args.batch,
    }))


if __name__ == "__main__":
    main()
