#!/usr/bin/env python
"""Probe: per-op device-time breakdown of a teacher forward (merged
deploy form, bf16 operands, 640x192) for any rep_size.

Written to chase the XL pathology (BENCHMARKS.md "XL layout-poisoning
close-out"): XL with the pallas FFN kernel measured 586 ms/iter, 507 ms
of it one 27x27 depthwise conv that XLA lowered with the
EmitDepthwiseInputBatchInSublanes emitter after the Mosaic custom-call's
pinned result layout propagated into it. `--ffn_backend lax` isolates
the kernel's layout influence; `--merged 0` profiles the training form.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_xl.py \
      [--size b|l|xl] [--ffn_backend auto|lax|mxu] [--top N]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import tempfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="xl")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--merged", type=int, default=1)
    ap.add_argument("--ffn_backend", default=None)
    ap.add_argument("--lk_deploy_backend", default=None)
    ap.add_argument("--banded", type=int, default=1,
                    help="build banded LK tables for the merged form "
                         "(consumed only when lk_deploy_backend resolves "
                         "to banded for a stage)")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=18)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from ppeadepth_tpu.options import Config
    from ppeadepth_tpu.models import RepDepth

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    kw = dict(adapter=True, rep_size=args.size, use_checkpoint=False,
              height=192, width=640, adpt_test=4)
    if args.ffn_backend:
        kw["ffn_backend"] = args.ffn_backend
    if args.lk_deploy_backend:
        kw["lk_deploy_backend"] = args.lk_deploy_backend
    opt = Config(**kw)
    model = RepDepth(opt)
    B = args.batch
    x = jnp.zeros((B, opt.height, opt.width, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "droppath": jax.random.PRNGKey(1)},
            x[:1], method=RepDepth.forward_mono)
    )()
    if args.merged:
        from ppeadepth_tpu.ckpt.deploy import banded_tables, structural_reparam
        mp, ms = structural_reparam(
            variables["params"], variables["batch_stats"])
        variables = {"params": mp, "batch_stats": ms}
        if args.banded and opt.lk_deploy_backend != "lax":
            bt = banded_tables(mp, (opt.height, opt.width))
            if bt:
                variables["banded"] = bt
        model = RepDepth(opt.replace(merged=True))
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)

    fwd = jax.jit(
        lambda v, img: model.apply(
            v, img, False, method=RepDepth.forward_mono)[("disp", 0)])

    rng = np.random.RandomState(0)
    imgs = [jnp.asarray(rng.rand(B, opt.height, opt.width, 3)
                        .astype(np.float32)).astype(jnp.bfloat16)
            for _ in range(args.iters)]
    out = fwd(variables, imgs[0])
    jax.block_until_ready(out)

    tmp = tempfile.mkdtemp(prefix="probe_xl")
    jax.profiler.start_trace(tmp)
    for i in range(args.iters):
        out = fwd(variables, imgs[i])
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(f"{tmp}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    # device lanes: the TPU process's "XLA Modules" (module totals) and
    # "XLA Ops" (per-op) threads, identified via trace metadata
    lanes = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    ops = collections.Counter()
    jit_total = 0.0
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = lanes.get((e.get("pid"), e.get("tid")), "")
        if lane == "XLA Modules" and e["name"].startswith("jit"):
            jit_total += e["dur"]
        elif lane == "XLA Ops":
            ops[e["name"]] += e["dur"]
    op_total = sum(ops.values())
    print(f"module total: {jit_total/1e3/args.iters:.2f} ms/iter; "
          f"op-lane total: {op_total/1e3/args.iters:.2f} ms/iter; "
          f"{len(ops)} distinct ops")
    shown = 0.0
    for name, dur in ops.most_common(args.top):
        shown += dur
        print(f"{dur/1e3/args.iters:9.3f} ms  {name}")
    print(f"(top {args.top} = {shown/1e3/args.iters:.2f} ms/iter)")


if __name__ == "__main__":
    main()
