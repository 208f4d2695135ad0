#!/usr/bin/env python
"""Layer-ablation study END-TO-END on device (round-5 VERDICT #7).

The reference's progressive-importance analysis disables each encoder
block's adapters in turn and logs AbsRel/a1 per block
(/root/reference/ppeadepth/evaluate_depth_layer.py:353-417). Here:

  1. train a stage-1 model on a procedural synthetic scene
     (tools/synth_convergence.run_convergence — the round-4 recipe);
  2. ablate every adapter block of BOTH encoders via the param-tree
     zeroing in eval/ablation.py (zero the block's D_fc2 == identity
     adapter == reference `blk.test_id = -1`);
  3. evaluate each ablation on the held-out frames through the SAME
     jitted student (multi-frame) eval — one compile for all ~100
     ablations; per-ablation wall time is reported to prove it.

Usage (on-device, ~35 min at the defaults):
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/ablation_study.py \
      --rep_size b --height 128 --width 416 --steps 400 --batch_size 8 \
      --frames 60 --out ABLATION.md
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rep_size", default="t")
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--eval_frames", type=int, default=8)
    p.add_argument("--compute_dtype", default="float32")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="")
    p.add_argument("--repl", default="repl_synth.txt")
    a = p.parse_args()

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from ppeadepth_tpu.eval.ablation import adapter_block_paths, zero_adapter
    from tools.synth_convergence import run_convergence

    results, state, eval_metrics = run_convergence(
        rep_size=a.rep_size, height=a.height, width=a.width,
        steps=a.steps, batch_size=a.batch_size, frames=a.frames,
        eval_frames=a.eval_frames, seed=a.seed,
        compute_dtype=a.compute_dtype, return_eval=True)
    base = results["final_multi"]
    print(f"baseline (student/multi): abs_rel {base['abs_rel']:.4f} "
          f"a1 {base['a1']:.4f}", file=sys.stderr)

    params = state.params
    rows, times = [], []
    with open(a.repl, "w") as f:
        for sub in ("encoder", "mono_encoder"):
            for block in adapter_block_paths(params, sub):
                t0 = time.perf_counter()
                m = eval_metrics(state, multi=True,
                                 params=zero_adapter(params, block))
                dt = time.perf_counter() - t0
                times.append(dt)
                name = "/".join(block)
                # reference repl.txt format: '<block> <abs_rel> <a1>'
                f.write(f"{name} {m['abs_rel']:.5f} {m['a1']:.5f}\n")
                f.flush()
                rows.append({"block": name,
                             "abs_rel": round(float(m["abs_rel"]), 5),
                             "a1": round(float(m["a1"]), 5),
                             "d_abs_rel": round(
                                 float(m["abs_rel"] - base["abs_rel"]), 5),
                             "eval_s": round(dt, 2)})
                print(f"{name:58s} abs_rel {m['abs_rel']:.4f} "
                      f"(d {m['abs_rel'] - base['abs_rel']:+.4f}) "
                      f"a1 {m['a1']:.4f}  [{dt:.1f}s]", file=sys.stderr)

    # one jitted eval reused: after the first ablation (which may pay a
    # residual compile) every evaluation should take ~the same time
    t_rest = times[1:] if len(times) > 1 else times
    summary = {
        "metric": "layer_ablation_blocks",
        "value": len(rows),
        "baseline_abs_rel": round(float(base["abs_rel"]), 5),
        "baseline_a1": round(float(base["a1"]), 5),
        "eval_s_first": round(times[0], 2),
        "eval_s_median_rest": round(float(np.median(t_rest)), 2),
        "eval_s_max_rest": round(float(np.max(t_rest)), 2),
        "top_blocks_by_abs_rel_impact": sorted(
            rows, key=lambda r: -r["d_abs_rel"])[:8],
    }
    print(json.dumps(summary, default=float))
    if a.out:
        with open(a.out, "w") as f:
            json.dump({"summary": summary, "rows": rows}, f, indent=1,
                      default=float)


if __name__ == "__main__":
    main()
