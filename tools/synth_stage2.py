"""Two-stage progressive training protocol on synthetic scenes.

The reference's headline contribution is PROGRESSIVE adaptation: stage 1
trains adapters+decoders+pose on static-majority KITTI, stage 2
fine-tunes ONLY the adapter subset (dc freezing, dc_ft_init
repdepth.py:175-262) on dynamic CityScapes scenes, warm-started from the
stage-1 checkpoint with --ktf (trainer.py:90-103, :151). No real dataset
or pretrained backbone exists in this image, so this tool measures the
same protocol end-to-end on procedural scenes with analytic GT depth:

  stage 1: static scene A (tools/synth_scene.py), full stage-1
           trainable set, from random init;
  stage 2: DYNAMIC scene B (independently moving boxes — crossing
           traffic + a leading vehicle), dc freezing (adapters only in
           the decoders), --ktf warm start (params + depth-bin tracker,
           fresh Adam), reference fine-tune learning-rate scale.

Reported: held-out depth metrics on scene B for (a) the stage-1 model
zero-shot (= stage 2's "init" row) and (b) after the dc fine-tune —
the measurable claim of the protocol is (b) beats (a).

Usage (TPU):
  python tools/synth_stage2.py --rep_size b --height 128 --width 416 \
      --steps1 600 --steps2 400 --batch_size 8
CPU smoke (tests/test_synth_convergence.py::test_stage2_mechanics):
  python tools/synth_stage2.py --rep_size t --height 64 --width 96 \
      --steps1 8 --steps2 8 --batch_size 4 --frames 24 --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_two_stage(rep_size="t", height=64, width=96, steps1=30, steps2=30,
                  batch_size=4, frames=60, eval_frames=8, seed=0,
                  n_movers=4, lr1=1e-4, lr2=2e-5, compute_dtype="float32",
                  dec_id=1, eval_every=0, log=print):
    from tools.synth_convergence import run_convergence

    log("=== stage 1: static scene A, full stage-1 trainable set ===")
    r1, state1 = run_convergence(
        rep_size=rep_size, height=height, width=width, steps=steps1,
        batch_size=batch_size, frames=frames, eval_frames=eval_frames,
        seed=seed, compute_dtype=compute_dtype, learning_rate=lr1,
        eval_every=eval_every, log=log, return_state=True)

    log("=== stage 2: dynamic scene B, dc freezing, --ktf warm start ===")
    r2 = run_convergence(
        rep_size=rep_size, height=height, width=width, steps=steps2,
        batch_size=batch_size, frames=frames, eval_frames=eval_frames,
        seed=seed, scene_seed=seed + 1000, n_movers=n_movers,
        compute_dtype=compute_dtype, learning_rate=lr2,
        eval_every=eval_every, log=log,
        config_overrides={"dc": True, "dec_id": dec_id, "ktf": True,
                          "train_cs": True},
        init_state=state1)

    out = {
        "stage1": r1,
        "stage2": r2,
        "zero_shot_dynamic_abs_rel": r2["init"]["abs_rel"],
        "finetuned_dynamic_abs_rel": r2["final"]["abs_rel"],
    }
    log(f"scene B zero-shot abs_rel {out['zero_shot_dynamic_abs_rel']:.4f}"
        f" -> dc-finetuned {out['finetuned_dynamic_abs_rel']:.4f}")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rep_size", default="t")
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--steps1", type=int, default=30)
    p.add_argument("--steps2", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--eval_frames", type=int, default=8)
    p.add_argument("--n_movers", type=int, default=4)
    p.add_argument("--dec_id", type=int, default=1)
    p.add_argument("--compute_dtype", default="float32")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr1", type=float, default=1e-4)
    p.add_argument("--lr2", type=float, default=2e-5)
    p.add_argument("--eval_every", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="")
    a = p.parse_args()
    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    r = run_two_stage(
        rep_size=a.rep_size, height=a.height, width=a.width,
        steps1=a.steps1, steps2=a.steps2, batch_size=a.batch_size,
        frames=a.frames, eval_frames=a.eval_frames, seed=a.seed,
        n_movers=a.n_movers, lr1=a.lr1, lr2=a.lr2, dec_id=a.dec_id,
        eval_every=a.eval_every, compute_dtype=a.compute_dtype)
    print(json.dumps(r, indent=2, default=float))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(r, f, indent=2, default=float)


if __name__ == "__main__":
    main()
