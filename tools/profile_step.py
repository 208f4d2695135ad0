#!/usr/bin/env python
"""Profile the full train step on the real TPU and print a device-time
breakdown by HLO op category + the top individual ops.

Wall-clock through the axon tunnel is garbage (CLAUDE.md); the profiler
trace is ground truth. Usage:

  python tools/profile_step.py [--batch 12] [--iters 4] [--remat]
          [--cv_backend auto|lax|mxu] [--dtype bfloat16|float32]

Categories come from the HLO op name prefix (fusion / convolution /
all-reduce / copy / ...). Top ops print with their full names so the hot
fusion can be cross-referenced in xprof if needed.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat_loss", action="store_true")
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--rep_size", default="b")
    p.add_argument("--remat_policy", default="full",
                   help="full | save_warps (options.remat_policy)")
    p.add_argument("--warp_backend", default="auto")
    p.add_argument("--cv_backend", default="auto")
    p.add_argument("--lk_train_backend", default="auto",
                   help="lax | auto | banded (kernels/banded_conv.py "
                        "training path; per-stage comma list accepted)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--category", default="",
                   help="also print the top ops WITHIN this hlo_category "
                        "(e.g. 'convolution')")
    p.add_argument("--dump_ops", default="",
                   help="write {op: {us, category}} JSON for offline "
                        "joins against dump_hlo.py op_name metadata")
    p.add_argument("--mono_only", action="store_true",
                   help="profile the teacher forward instead")
    p.add_argument("--sharded", action="store_true",
                   help="replicate state / shard batch over the active "
                        "mesh first (reproduces the Trainer's GSPMD "
                        "compile, which differs from bare jit even on "
                        "one device)")
    p.add_argument("--merged", action="store_true",
                   help="with --mono_only: structural-reparam deploy form "
                        "(the bench.py configuration)")
    args = p.parse_args()

    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from ppeadepth_tpu.models import RepDepth
    from ppeadepth_tpu.options import Config
    from ppeadepth_tpu.train import schedule
    from ppeadepth_tpu.train.step import create_train_state, make_train_step

    opt = Config(
        adapter=True, rep_size=args.rep_size, use_checkpoint=args.remat,
        height=args.height, width=args.width, batch_size=args.batch,
        adpt_test=4, compute_dtype=args.dtype, cv_backend=args.cv_backend,
        warp_backend=args.warp_backend,
        remat_loss=args.remat_loss, remat_policy=args.remat_policy,
        grad_accum=args.grad_accum, lk_train_backend=args.lk_train_backend,
    )
    model = RepDepth(opt)

    rng = np.random.RandomState(0)
    B, H, W = args.batch, args.height, args.width
    batch = {}
    for f in (0, -1, 1):
        img = rng.rand(B, H, W, 3).astype(np.float32)
        batch[("color", f, 0)] = jnp.asarray(img)
        batch[("color_aug", f, 0)] = jnp.asarray(img)
    for s in (0, 2):
        K = np.eye(4, dtype=np.float32)
        sc = 2 ** s
        K[0, 0], K[1, 1] = 0.58 * W / sc, 1.92 * H / sc
        K[0, 2], K[1, 2] = 0.5 * W / sc, 0.5 * H / sc
        batch[("K", s)] = jnp.asarray(np.stack([K] * B))
        batch[("inv_K", s)] = jnp.asarray(np.stack([np.linalg.pinv(K)] * B))

    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "droppath": jax.random.PRNGKey(1),
             "aug": jax.random.PRNGKey(2)},
            batch, 0.1, 10.0, False,
        )
    )()

    if args.mono_only:
        if args.merged:
            from ppeadepth_tpu.ckpt.deploy import structural_reparam

            mp, ms = structural_reparam(
                variables["params"], variables["batch_stats"])
            variables = {"params": mp, "batch_stats": ms}
            model = RepDepth(opt.replace(merged=True))
        if args.dtype == "bfloat16":
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, variables)
        fwd = jax.jit(lambda v, img: model.apply(
            v, img, False, method=RepDepth.forward_mono)[("disp", 0)])
        img0 = batch[("color", 0, 0)]
        if args.dtype == "bfloat16":
            img0 = img0.astype(jnp.bfloat16)  # bench.py casts inputs too

        def run(i, carry):
            return carry, fwd(variables, img0)
        carry = None
        print("compiling teacher forward...", file=sys.stderr)
        _, out = run(0, carry)
        jax.block_until_ready(out)
    else:
        tx = schedule.make_optimizer(opt.learning_rate, steps_per_epoch=1000)
        state = create_train_state(model, variables, opt, tx)
        if args.sharded:
            from ppeadepth_tpu.parallel import mesh as mesh_lib

            mesh = mesh_lib.make_mesh()
            state = mesh_lib.replicate(state, mesh)
            batch = mesh_lib.shard_batch(batch, mesh)
        if args.grad_accum > 1:
            from ppeadepth_tpu.train.step import stack_microbatches

            batch = jax.jit(
                lambda b: stack_microbatches(b, args.grad_accum))(batch)
        step_fn = make_train_step(model, opt, tx, donate=True)

        def run(i, carry):
            new_state, metrics = step_fn(carry, batch, jax.random.PRNGKey(i))
            return new_state, metrics

        print("compiling train step (can take minutes uncached)...",
              file=sys.stderr)
        carry, out = run(0, state)
        jax.block_until_ready(out["loss"])
        print(f"warm loss: {float(out['loss']):.4f}", file=sys.stderr)

    tmp = tempfile.mkdtemp(prefix="ppea_profile")
    jax.profiler.start_trace(tmp)
    for i in range(1, args.iters + 1):
        carry, out = run(i, carry)
    jax.block_until_ready(out if args.mono_only else out["loss"])
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(f"{tmp}/plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {tmp}"
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)

    # device-side op events: pid/tid vary; use 'X' events that are NOT the
    # top-level jit program and carry a duration
    per_op = collections.Counter()
    per_cat = collections.Counter()
    op_cat = {}
    jit_total = 0.0
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            jit_total += e["dur"]
            continue
        args_d = e.get("args") or {}
        hlo_cat = args_d.get("hlo_category")
        if hlo_cat is None and "run_id" not in args_d:
            continue  # host-side event
        per_op[name] += e["dur"]
        op_cat[name] = hlo_cat or name.rstrip("0123456789.")
        per_cat[op_cat[name]] += e["dur"]

    n = args.iters
    print(f"\n== totals over {n} iters ==")
    print(f"jit program device time: {jit_total / 1e3 / n:.2f} ms/iter")
    tot = sum(per_cat.values())
    print(f"sum of op events:        {tot / 1e3 / n:.2f} ms/iter")
    print("\n== by category (ms/iter) ==")
    for cat, us in per_cat.most_common(20):
        print(f"{us / 1e3 / n:9.2f}  {us / tot * 100:5.1f}%  {cat}")
    print(f"\n== top {args.top} ops (ms/iter) ==")
    for name, us in per_op.most_common(args.top):
        print(f"{us / 1e3 / n:9.2f}  {us / tot * 100:5.1f}%  {name[:110]}")
    if args.dump_ops:
        with open(args.dump_ops, "w") as f:
            json.dump({k: {"us": v, "category": op_cat.get(k, "")}
                       for k, v in per_op.items()}, f)
        print(f"wrote {args.dump_ops} ({len(per_op)} ops)")
    if args.category:
        sub = {k: v for k, v in per_op.items()
               if args.category in op_cat.get(k, "")}
        print(f"\n== top {args.top} '{args.category}' ops "
              f"({sum(sub.values()) / 1e3 / n:.2f} ms/iter total) ==")
        for name, us in collections.Counter(sub).most_common(args.top):
            print(f"{us / 1e3 / n:9.2f}  {us / tot * 100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
