#!/usr/bin/env python
"""Measure SUSTAINED training throughput end-to-end, host input pipeline
included (VERDICT round-1 item #6: replace the projected epoch wall-clock
with a measured one).

Generates a synthetic on-disk KITTI tree at raw-KITTI resolution
(1242x375 JPEGs, the same files the reference's eigen_zhou loader reads:
kitti_dataset.py get_color -> 1242x375 -> resize 640x192), a split that
cycles those frames for `--steps` batches, then drives the REAL Trainer
(loader threads -> device prefetch -> jitted step) and reports imgs/s
sustained over the steady-state window (everything after the first
logging period, which absorbs compile).

Wall-clock over a ~2-minute window is trustworthy through the axon
tunnel (the per-op timing pathologies in CLAUDE.md average out; the run
is bounded by device + host pipeline with dispatch fully pipelined).

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/time_epoch.py \
      [--steps 200] [--batch 12] [--fast_pipeline] [--workers 8]
"""

import argparse
import json
import os
import re
import sys
import tempfile
import time


def make_synthetic_kitti(root, n_frames=64, w=1242, h=375):
    """Gradient+noise JPEGs (decode cost ~ natural images, not noise)."""
    import numpy as np
    from PIL import Image

    folder = "2011_09_26/2011_09_26_drive_0001_sync"
    img_dir = os.path.join(root, folder, "image_02", "data")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    yy = np.linspace(0, 255, h, dtype=np.float32)[:, None, None]
    xx = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
    for i in range(n_frames):
        base = 0.5 * yy + 0.3 * xx + 20.0 * np.sin(i + xx / 40.0)
        img = base + rng.randn(h, w, 3).astype(np.float32) * 12.0
        arr = np.clip(img, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(img_dir, f"{i:010d}.jpg"), quality=92
        )
    return folder


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--fast_pipeline", action="store_true")
    p.add_argument("--decode_cache", type=str, default="",
                   help="decoded-raw cache dir (with --fast_pipeline)")
    p.add_argument("--epochs", type=int, default=1,
                   help=">1 exercises the persistent-worker epoch restart")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat_loss", action="store_true")
    p.add_argument("--remat_policy", type=str, default="full",
                   help="full | save_warps (see options.remat_policy)")
    p.add_argument("--synthetic", action="store_true",
                   help="drive the sharded step on one fixed device batch "
                        "(no loader) — isolates device rate from host")
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    args = p.parse_args()

    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ppeadepth_tpu.options import Config
    from ppeadepth_tpu.train.trainer import Trainer

    tmp = tempfile.mkdtemp(prefix="ppea_epoch")
    root = os.path.join(tmp, "kitti")
    print(f"generating {args.frames} synthetic KITTI frames...",
          file=sys.stderr)
    folder = make_synthetic_kitti(root, args.frames)

    # split cycling the synthetic frames: steps*batch triplet lines
    splits = os.path.join(tmp, "splits", "timing")
    os.makedirs(splits, exist_ok=True)
    n_items = args.steps * args.batch
    usable = range(1, args.frames - 1)  # need -1/+1 neighbours
    lines = [f"{folder} {list(usable)[i % len(usable)]} l"
             for i in range(n_items)]
    with open(os.path.join(splits, "train_files.txt"), "w") as f:
        f.write("\n".join(lines))
    with open(os.path.join(splits, "test_files.txt"), "w") as f:
        f.write("\n".join(lines[: args.batch]))

    opt = Config(
        weights_init="scratch",
        adapter=True, rep_size="b", adpt_test=4,
        use_checkpoint=args.remat, compute_dtype="bfloat16",
        remat_loss=args.remat_loss, remat_policy=args.remat_policy,
        height=args.height, width=args.width, batch_size=args.batch,
        data_path=root, split="timing", num_epochs=args.epochs,
        num_workers=args.workers, validate_every=0,
        log_dir=os.path.join(tmp, "log"), name="timing",
        fast_pipeline=args.fast_pipeline, decode_cache=args.decode_cache,
    )
    trainer = Trainer(opt, splits_dir=os.path.join(tmp, "splits"))
    print(f"steps_per_epoch={trainer.steps_per_epoch}", file=sys.stderr)

    if args.synthetic:
        import jax
        from ppeadepth_tpu.train.trainer import synthetic_batch
        from ppeadepth_tpu.parallel import mesh as mesh_lib

        batch = synthetic_batch(opt, args.batch)
        batch = {k: v for k, v in batch.items()
                 if not (isinstance(k, tuple) and k[0] in
                         ("color", "color_aug") and k[2] > 0)}
        batch = mesh_lib.shard_batch(batch, trainer.mesh)
        state = trainer.state
        rng = jax.random.PRNGKey(0)
        # trainer.step_fn donates the batch (fresh per step in the real
        # loop); this loop re-feeds ONE batch, so build a non-batch-
        # donating step
        from ppeadepth_tpu.train.step import make_train_step
        step_fn = make_train_step(trainer.model, trainer.opt, trainer.tx)
        print("compiling sharded step...", file=sys.stderr)
        state, m = step_fn(state, batch, rng)
        # block_until_ready resolves EARLY through the axon tunnel
        # (CLAUDE.md); an actual D2H fetch is the only true sync
        float(jax.device_get(m["loss"]))
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, m = step_fn(state, batch,
                               jax.random.fold_in(rng, i))
        loss = float(jax.device_get(m["loss"]))
        dt = time.perf_counter() - t0
        print(f"final loss {loss:.4f}", file=sys.stderr)
        print(json.dumps({
            "metric": "train_imgs_per_s_sharded_device",
            "value": round(args.steps * args.batch / dt, 2),
            "unit": "imgs/s/chip", "steps": args.steps,
            "batch": args.batch, "wallclock_s": round(dt, 1),
        }))
        return

    # capture the trainer's own 50-step imgs/s prints
    t0 = time.perf_counter()
    import io
    import contextlib

    class Tee(io.StringIO):
        def write(self, s):
            sys.stderr.write(s)
            return super().write(s)

    buf = Tee()
    with contextlib.redirect_stdout(buf):
        trainer.train()
    total = time.perf_counter() - t0

    rates = [float(m) for m in re.findall(r"([\d.]+) img/s", buf.getvalue())]
    # steady state: drop the first window (contains compile)
    steady = rates[1:] if len(rates) > 1 else rates
    sustained = sum(steady) / max(len(steady), 1)
    result = {
        "metric": "train_imgs_per_s_sustained_e2e",
        "value": round(sustained, 2),
        "unit": "imgs/s/chip",
        "steps": args.steps,
        "batch": args.batch,
        "fast_pipeline": args.fast_pipeline,
        "windows_imgs_per_s": rates,
        "total_wallclock_s": round(total, 1),
        "epoch_projection_min_kitti_39810": round(
            39810 / max(sustained, 1e-9) / 60, 1
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
