#!/usr/bin/env python
"""AOT memory analysis of the bare train step (no execution): compile
via jax.jit(...).lower().compile() and print XLA's buffer accounting
(temp/argument/output/alias bytes). Grounds HBM-fit questions without
burning a device run.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_mem.py \
      [--batch 12] [--remat_loss] [--grad_accum N] [--rep_size b|l]
"""

import argparse
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat_loss", action="store_true")
    p.add_argument("--frozen_bf16", default="auto")
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--rep_size", default="b")
    p.add_argument("--lk_train_backend", default="lax")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ppeadepth_tpu.models import RepDepth
    from ppeadepth_tpu.options import Config
    from ppeadepth_tpu.train import schedule
    from ppeadepth_tpu.train.step import create_train_state, make_loss_fn
    from ppeadepth_tpu.train.step import make_train_step

    B, H, W = args.batch, args.height, args.width
    opt = Config(adapter=True, rep_size=args.rep_size, use_checkpoint=args.remat,
                 height=H, width=W, batch_size=B, adpt_test=4,
                 compute_dtype="bfloat16", remat_loss=args.remat_loss,
                 frozen_bf16=args.frozen_bf16, grad_accum=args.grad_accum,
                 lk_train_backend=args.lk_train_backend)
    model = RepDepth(opt)
    rng = np.random.RandomState(0)
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
    tx = schedule.make_optimizer(opt.learning_rate, steps_per_epoch=1000)
    state = create_train_state(model, variables, opt, tx)
    if args.grad_accum > 1:
        from ppeadepth_tpu.train.step import stack_microbatches

        batch = jax.jit(
            lambda b: stack_microbatches(b, args.grad_accum))(batch)
    step_fn = make_train_step(model, opt, tx, donate=True)
    # the jitted fn inside make_train_step; lower via the public wrapper
    lowered = step_fn.lower(state, batch, jax.random.PRNGKey(0)) \
        if hasattr(step_fn, "lower") else None
    if lowered is None:
        import jax

        def raw(state, batch, rng):
            return step_fn(state, batch, rng)
        print("step_fn not lowerable; wrap", file=sys.stderr)
        return
    print("lowered; compiling (AOT)...", file=sys.stderr)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = 1 / (1024 ** 3)
    print({
        "temp_gb": round(ma.temp_size_in_bytes * gb, 3),
        "argument_gb": round(ma.argument_size_in_bytes * gb, 3),
        "output_gb": round(ma.output_size_in_bytes * gb, 3),
        "alias_gb": round(ma.alias_size_in_bytes * gb, 3),
        "peak_est_gb": round(
            (ma.temp_size_in_bytes + ma.argument_size_in_bytes
             + ma.output_size_in_bytes - ma.alias_size_in_bytes) * gb, 3),
    })


if __name__ == "__main__":
    main()
