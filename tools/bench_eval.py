#!/usr/bin/env python
"""Benchmark the evaluator at eigen-split scale (round-5 VERDICT #8).

The reference evaluates on rank 0 while other ranks idle at a barrier
(trainer.py:653-857); our eval/evaluator.run_eval dp-shards every eval
batch over the active mesh. This tool puts numbers on that claim: 697
synthetic eigen-sized images (640x192) through the full student eval —
device pass (plain jit vs mesh-sharded path), then the host metric pass
— reporting imgs/s and the host-side share.

On the single real chip the sharded path runs a 1-device mesh (its
overhead = sharding machinery, not parallelism); on an N-chip pod the
same code path fans out. CPU check: --cpu --devices 8 exercises a real
8-device dp mesh end-to-end.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_eval.py \
      [--images 697] [--batch 16] [--rep_size b] [--cpu --devices 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=697)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--rep_size", default="b")
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--devices", type=int, default=0,
                   help="with --cpu: virtual device count")
    a = p.parse_args()

    import os

    if a.cpu and a.devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={a.devices}")
    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    import jax.numpy as jnp

    from ppeadepth_tpu.eval import evaluator, metrics
    from ppeadepth_tpu.models import RepDepth
    from ppeadepth_tpu.options import Config
    from ppeadepth_tpu.parallel import mesh as mesh_lib
    from ppeadepth_tpu.train.trainer import synthetic_batch

    H, W = a.height, a.width
    opt = Config(adapter=True, rep_size=a.rep_size, use_checkpoint=False,
                 height=H, width=W, adpt_test=4, eval_split="custom",
                 compute_dtype=("float32" if a.cpu else "bfloat16"))
    model = RepDepth(opt)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "droppath": jax.random.PRNGKey(1),
             "aug": jax.random.PRNGKey(2)},
            synthetic_batch(opt, 1), 0.1, 10.0, False,
        )
    )()

    # synthetic eigen-sized eval set, host-resident like a real loader's
    # output; smooth images (decode realism is time_epoch.py's job)
    rng = np.random.RandomState(0)
    base = rng.rand(H, W + 8, 3).astype(np.float32)
    for _ in range(3):
        base = (0.5 * base + 0.25 * np.roll(base, 1, 1)
                + 0.25 * np.roll(base, -1, 1))
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * W / 4, 1.92 * H / 4
    K[0, 2], K[1, 2] = 0.5 * W / 4, 0.5 * H / 4

    def batches():
        for i in range(0, a.images, a.batch):
            n = min(a.batch, a.images - i)
            sh = (i * 7) % 8
            cur = np.stack([base[:, 4 + sh:4 + sh + W]] * n)
            prev = np.stack([base[:, sh:sh + W]] * n)
            cur = cur + rng.rand(n, H, W, 3).astype(np.float32) * 0.02
            yield {
                ("color", 0, 0): cur.astype(np.float32),
                ("color", -1, 0): prev.astype(np.float32),
                ("K", 2): np.stack([K] * n),
                ("inv_K", 2): np.stack([np.linalg.pinv(K)] * n),
            }

    gt = [np.clip(5 + 20 * rng.rand(375, 1242).astype(np.float32), 1, 80)
          for _ in range(a.images)]

    out = {"images": a.images, "batch": a.batch, "rep_size": a.rep_size}

    # device-only eval-step rate (profiler trace, device-resident batch):
    # on the tunneled chip the e2e wall-clock below is dominated by H2D
    # at ~10 MB/s (56 MB/batch), so it measures the tunnel, not the
    # evaluator — production hosts feed over PCIe/DMA.
    import collections
    import glob as _glob
    import gzip
    import tempfile

    ev0 = evaluator.make_eval_step(model, opt, False)
    wb0 = {k: jnp.asarray(v) for k, v in next(batches()).items()}
    r = np.asarray(ev0(variables, wb0, jnp.float32(0.1),
                       jnp.float32(10.0))[0])
    try:
        tmp = tempfile.mkdtemp(prefix="evalbench")
        jax.profiler.start_trace(tmp)
        for _ in range(6):
            r = ev0(variables, wb0, jnp.float32(0.1), jnp.float32(10.0))[0]
        jax.block_until_ready(r)
        np.asarray(r)
        jax.profiler.stop_trace()
        durs = collections.Counter()
        with gzip.open(sorted(_glob.glob(
                f"{tmp}/plugins/profile/*/*.trace.json.gz"))[-1]) as f:
            for e in json.load(f).get("traceEvents", []):
                if e.get("ph") == "X" and "dur" in e and \
                        e.get("name", "").startswith("jit"):
                    durs[e["name"]] += e["dur"]
        if durs:
            dt = durs.most_common(1)[0][1] / 1e6 / 6
            out["eval_step_device_ms"] = round(dt * 1e3, 2)
            out["eval_imgs_per_s_per_chip_device"] = round(a.batch / dt, 1)
    except Exception as e:  # noqa: BLE001
        print(f"device trace skipped: {e}", file=sys.stderr)
    for mode in ("plain", "sharded"):
        mesh = mesh_lib.make_mesh() if mode == "sharded" else None
        if mesh is not None:
            out["mesh_devices"] = int(mesh.devices.size)
        # warm/compile (excluded from timing)
        warm = next(batches())
        ev = evaluator.make_eval_step(model, opt, False)
        v = (mesh_lib.replicate(variables, mesh) if mesh is not None
             else variables)
        wb = {k: jnp.asarray(x) for k, x in warm.items()}
        if mesh is not None:
            wb = mesh_lib.shard_batch(wb, mesh)
        np.asarray(ev(v, wb, jnp.float32(0.1), jnp.float32(10.0))[0])

        t0 = time.perf_counter()
        errors, _ = evaluator.run_eval(
            model, variables, opt, batches(), min_bin=0.1, max_bin=10.0,
            gt_depths=gt, mesh=mesh)
        t1 = time.perf_counter()
        # isolate the host metric pass by re-running it alone
        disp = np.full((a.images, H // 1, W // 1), 0.1, np.float32)
        t2 = time.perf_counter()
        metrics.evaluate_disps(disp, gt, "custom", 0.1, 80.0,
                               opt.disable_median_scaling,
                               opt.pred_depth_scale_factor)
        t3 = time.perf_counter()
        out[f"{mode}_imgs_per_s"] = round(a.images / (t1 - t0), 2)
        out[f"{mode}_total_s"] = round(t1 - t0, 2)
        out["host_metric_pass_s"] = round(t3 - t2, 2)
        out[f"{mode}_abs_rel"] = round(float(errors[0]), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
