#!/usr/bin/env python
"""Sweep the MXU cost-volume kernel's tiling knobs on the real chip.

kernels/cost_volume_mxu.frame_diffs_batch has two static knobs:
  rows_per_tile — output rows per grid step (amortizes the WX hat build
                  and the per-row matmul dispatch);
  bins_per_step — depth bins stacked along the matmul M axis (one
                  dispatch per lookup row serves all of them, at the
                  cost of a wider union y-band).
Round 2 shipped (2, 8); this probe measures the grid of combinations at
KITTI matching shapes and checks each against the (2, 8) output.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_cv.py [--batch 12]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import tempfile


def _device_ms(run, iters):
    import jax

    tmp = tempfile.mkdtemp(prefix="probe_cv")
    jax.profiler.start_trace(tmp)
    for i in range(iters):
        out = run(i)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(f"{tmp}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    durs = collections.Counter()
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and e.get(
                "name", "").startswith("jit"):
            durs[e["name"]] += e["dur"]
    return durs.most_common(1)[0][1] / 1e3 / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--bins", type=int, default=96)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ppeadepth_tpu.kernels.cost_volume_mxu import frame_diffs_batch

    B, H, W, C, D = args.batch, 48, 160, 128, args.bins
    rng = np.random.RandomState(0)
    cur = jnp.asarray(rng.rand(B, H * W, C).astype(np.float32))
    lk = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    A = jnp.asarray(
        np.stack([np.eye(3, dtype=np.float32)] * B)
        + rng.rand(B, 3, 3).astype(np.float32) * 0.01)
    t = jnp.asarray((rng.rand(B, 3) * np.float32([0.1, 0.017, -0.04]))
                    .astype(np.float32))
    bins = jnp.linspace(0.5, 20.0, D)

    def run_cfg(rpt, bps):
        fn = jax.jit(lambda: frame_diffs_batch(
            cur, lk, A, t, bins, rows_per_tile=rpt, bins_per_step=bps))
        out = fn()  # compile + warm
        jax.block_until_ready(out)
        ms = _device_ms(lambda i: fn(), args.iters)
        return np.asarray(out), ms

    ref, base_ms = run_cfg(2, 8)
    print(f"rows=2 bins_per_step=8 (shipped): {base_ms:.2f} ms")
    results = {"(2,8)": round(base_ms, 2)}
    for rpt, bps in [(4, 8), (8, 8), (2, 16), (4, 16), (2, 4), (4, 4),
                     (8, 16), (6, 8), (2, 32), (4, 32), (2, 48)]:
        if H % rpt or D % bps:
            continue
        try:
            out, ms = run_cfg(rpt, bps)
        except Exception as e:  # noqa: BLE001
            print(f"rows={rpt} bins_per_step={bps}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")
            results[f"({rpt},{bps})"] = "fail"
            continue
        err = float(np.abs(out - ref).max())
        print(f"rows={rpt} bins_per_step={bps}: {ms:.2f} ms "
              f"(max abs err vs (2,8): {err:.2e})")
        results[f"({rpt},{bps})"] = round(ms, 2)
    print(json.dumps({"batch": B, "bins": D, "ms": results}))


if __name__ == "__main__":
    main()
