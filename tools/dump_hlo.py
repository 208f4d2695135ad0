#!/usr/bin/env python
"""Dump the optimized HLO of the full train step (or teacher forward) so
profiler fusion names (fusion.N) can be cross-referenced to source ops.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/dump_hlo.py out.hlo \
      [--batch 12] [--remat] [--mono_only]
"""

import argparse
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--cv_backend", default="auto")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--mono_only", action="store_true")
    p.add_argument("--merged", action="store_true",
                   help="with --mono_only: deploy (reparam-merged) form")
    args = p.parse_args()

    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp

    from ppeadepth_tpu.models import RepDepth
    from ppeadepth_tpu.options import Config
    from ppeadepth_tpu.train import schedule
    from ppeadepth_tpu.train.step import create_train_state, make_train_step

    opt = Config(
        adapter=True, rep_size="b", use_checkpoint=args.remat,
        height=args.height, width=args.width, batch_size=args.batch,
        adpt_test=4, compute_dtype=args.dtype, cv_backend=args.cv_backend,
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
        img0 = batch[("color", 0, 0)]
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
            img0 = img0.astype(jnp.bfloat16)
        fn = jax.jit(lambda v, img: model.apply(
            v, img, False, method=RepDepth.forward_mono)[("disp", 0)])
        lowered = fn.lower(variables, img0)
    else:
        tx = schedule.make_optimizer(opt.learning_rate, steps_per_epoch=1000)
        state = create_train_state(model, variables, opt, tx)
        step_fn = make_train_step(model, opt, tx, donate=True)
        lowered = step_fn.lower(state, batch, jax.random.PRNGKey(0))

    print("compiling...", file=sys.stderr)
    compiled = lowered.compile()
    with open(args.out, "w") as f:
        f.write(compiled.as_text())
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
