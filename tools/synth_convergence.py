"""Learning-dynamics benchmark on procedural synthetic scenes.

Trains the stage-1 configuration on rendered video with analytic GT
depth (tools/synth_scene.py) and reports held-out depth metrics at init
vs after training, plus the depth-bin EMA trajectory vs the scene's true
depth range. This is the strongest accuracy evidence available in an
image with no KITTI/CityScapes and no pretrained backbones: it exercises
bin adaptation over time, automask on structured motion, pose
convergence, and the consistency/matching masks jointly — none of which
overfit-one-batch covers. (Counterpart of the reference's
validation-as-test role, trainer.py:366-381.)

Usage (TPU):
  python tools/synth_convergence.py --rep_size b --height 128 --width 416 \
      --steps 400 --batch_size 8
CPU smoke (what tests/test_synth_convergence.py runs):
  python tools/synth_convergence.py --rep_size t --height 64 --width 96 \
      --steps 30 --batch_size 4 --frames 40
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _depth_metrics(gt, pred, max_depth=80.0):
    """Eigen-style metrics with per-image median scaling
    (evaluate_depth.py protocol)."""
    errs = []
    ratios = []
    for g, p in zip(gt, pred):
        mask = (g > 1e-3) & (g < max_depth)
        g, p = g[mask], p[mask]
        ratio = np.median(g) / np.median(p)
        ratios.append(ratio)
        p = np.clip(p * ratio, 1e-3, max_depth)
        thresh = np.maximum(g / p, p / g)
        errs.append((
            float(np.mean(np.abs(g - p) / g)),
            float(np.mean((g - p) ** 2 / g)),
            float(np.sqrt(np.mean((g - p) ** 2))),
            float(np.mean(thresh < 1.25)),
        ))
    a = np.asarray(errs).mean(0)
    return {"abs_rel": a[0], "sq_rel": a[1], "rmse": a[2], "a1": a[3],
            "median_ratio": float(np.mean(ratios))}


def run_convergence(rep_size="t", height=64, width=96, steps=30,
                    batch_size=4, frames=40, eval_frames=8, seed=0,
                    eval_every=0, log=print, compute_dtype="float32",
                    learning_rate=1e-4, use_trainer_flags=True,
                    scene_seed=None, n_movers=0, config_overrides=None,
                    init_state=None, return_state=False,
                    return_eval=False):
    """One training phase on a procedural scene.

    Stage-2 support (the reference's --train_cs --dc fine-tune,
    trainer.py:90-103): `config_overrides={"dc": True, ...}` applies the
    dc freezing partition, `init_state` warm-starts params/batch_stats
    AND the depth-bin tracker from a previous phase's TrainState (the
    --ktf load semantics, trainer.py:151 — optimizer state is NOT
    carried), `scene_seed`/`n_movers` select a different, dynamic scene.
    With `init_state`, the reported "init" metrics are the previous
    phase's model evaluated zero-shot on the new scene.
    """
    import jax
    import jax.numpy as jnp

    from ppeadepth_tpu.options import Config
    from ppeadepth_tpu.models import RepDepth
    from ppeadepth_tpu.core.geometry import disp_to_depth
    from ppeadepth_tpu.train import schedule
    from ppeadepth_tpu.train.step import create_train_state, make_train_step
    from tools.synth_scene import render_sequence

    opt = Config(
        adapter=True, rep_size=rep_size, use_checkpoint=False,
        height=height, width=width, batch_size=batch_size,
        num_depth_bins=16 if rep_size == "t" else 96,
        bin_chunk=4 if rep_size == "t" else 8,
        compute_dtype=compute_dtype,
    )
    if config_overrides:
        opt = opt.replace(**config_overrides)
    H, W = height, width

    t0 = time.time()
    n_total = frames + 1 + eval_frames + 1
    imgs, deps, K = render_sequence(
        n_total, H, W, seed=seed if scene_seed is None else scene_seed,
        n_movers=n_movers)
    log(f"rendered {n_total} frames in {time.time() - t0:.1f}s; "
        f"scene depth p5/p95 = "
        f"{np.percentile(deps[deps < 1000], 5):.1f}/"
        f"{np.percentile(deps[deps < 1000], 95):.1f} m")
    train_idx = list(range(1, frames))          # need f-1 and f+1
    eval_idx = list(range(frames + 1, n_total - 1))

    Ks = {}
    for s in (0, 2):
        Kx = K.copy()
        Kx[:2] /= 2 ** s
        Ks[s] = Kx

    # Device-resident dataset + jitted batch gather: the whole sequence is
    # ~45 MB, so it lives in HBM once and each step's batch is assembled
    # on device from frame indices (32 bytes H2D/step). The naive
    # per-step host assembly shipped ~30 MB f32 through the tunnel every
    # step and dominated wall-clock 10:1 over compute.
    imgs_dev = jnp.asarray(imgs)
    K_dev = {s: jnp.asarray(np.stack([Ks[s]] * batch_size)) for s in (0, 2)}
    iK_dev = {s: jnp.asarray(np.stack(
        [np.linalg.pinv(Ks[s])] * batch_size)) for s in (0, 2)}

    @jax.jit
    def gather_batch(centers):
        batch = {}
        for off in (0, -1, 1):
            arr = jnp.take(imgs_dev, centers + off, axis=0)
            batch[("color", off, 0)] = arr
            batch[("color_aug", off, 0)] = arr
        for s in (0, 2):
            batch[("K", s)] = K_dev[s]
            batch[("inv_K", s)] = iK_dev[s]
        return batch

    def make_batch(rs):
        centers = rs.choice(train_idx, size=batch_size, replace=False)
        return gather_batch(jnp.asarray(centers))

    model = RepDepth(opt)
    rngs = {"params": jax.random.PRNGKey(seed),
            "droppath": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}
    rs = np.random.RandomState(seed)
    init_batch = make_batch(rs)
    variables = jax.jit(lambda: model.init(
        rngs, init_batch, 0.1, 10.0, False))()
    if init_state is not None:
        # strict=False merge (Trainer --ktf load): dc=True grows the
        # decoders with fresh zero-init (≡ identity) deconv adapters that
        # the stage-1 tree does not carry, so warm-start paths that match
        # and keep the new adapters at init (repdepth.py:175-262).
        from ppeadepth_tpu.ckpt.io import merge_into

        merged_p, miss, unex = merge_into(
            variables["params"], init_state.params)
        merged_s, _, _ = merge_into(variables["batch_stats"],
                                    init_state.batch_stats)
        if miss:
            log(f"warm start: {len(miss)} fresh paths (dc adapters), "
                f"{len(unex)} unused")
        variables = {"params": merged_p, "batch_stats": merged_s}
    tx = schedule.make_optimizer(learning_rate,
                             steps_per_epoch=max(steps, 1))
    state = create_train_state(model, variables, opt, tx)
    if init_state is not None:
        # --ktf semantics: carry the depth-bin tracker, fresh Adam
        import dataclasses as _dc

        state = _dc.replace(state, min_depth_bin=init_state.min_depth_bin,
                            max_depth_bin=init_state.max_depth_bin)
    if opt.dc:
        from ppeadepth_tpu.train.freeze import count_params

        log(f"dc freezing: {count_params(state.trainable):,} trainable / "
            f"{count_params(state.trainable) + count_params(state.frozen):,}"
            f" total params")
    step_fn = make_train_step(model, opt, tx, donate=True)

    fwd = jax.jit(lambda p, st, x: model.apply(
        {"params": p, "batch_stats": st}, x, False,
        method=RepDepth.forward_mono))

    from ppeadepth_tpu.core.geometry import transformation_from_parameters

    @jax.jit
    def fwd_multi(p, st, img, lk, min_bin, max_bin):
        # student path: pose net on (lookup, current) -> cost volume ->
        # matching encoder -> decoder (serve.predict_depth_multi flow)
        v = {"params": p, "batch_stats": st}
        feats = model.apply(
            v, jnp.concatenate([lk, img], -1), False,
            method=lambda m, x, t: m.pose_encoder(x, t))
        aa, tt = model.apply(v, [feats], method=lambda m, f: m.pose(f))
        T = transformation_from_parameters(
            aa[:, 0, 0], tt[:, 0, 0], invert=True)
        out, _, _ = model.apply(
            v, img, lk[:, None], T[:, None],
            K_dev[2], iK_dev[2], min_bin, max_bin, False,
            method=RepDepth.forward_multi)
        return out[("disp", 0)]

    def eval_metrics(state, multi=False, params=None):
        # params override: the layer-ablation study evaluates edited
        # param trees through the SAME jitted eval (no recompiles)
        params = state.params if params is None else params
        preds = []
        for i in range(0, len(eval_idx), batch_size):
            idx = eval_idx[i:i + batch_size]
            x = jnp.asarray(imgs[idx])
            if multi:
                lk = jnp.asarray(imgs[[j - 1 for j in idx]])
                disp = fwd_multi(params, state.batch_stats, x, lk,
                                 jnp.float32(state.min_depth_bin),
                                 jnp.float32(state.max_depth_bin))
                disp = np.asarray(disp[..., 0], np.float32)
            else:
                out = fwd(params, state.batch_stats, x)
                disp = np.asarray(out[("disp", 0)][..., 0], np.float32)
            _, depth = disp_to_depth(disp, opt.min_depth, opt.max_depth)
            preds.extend(np.asarray(depth))
        gt = [deps[i] for i in eval_idx]
        return _depth_metrics(gt, preds)

    results = {"scene_depth_p5": float(np.percentile(deps[deps < 1000], 5)),
               "scene_depth_p95": float(np.percentile(deps[deps < 1000], 95))}
    m0 = eval_metrics(state)
    log(f"init metrics: {m0}")
    results["init"] = m0
    results["bins"] = [(0, float(state.min_depth_bin),
                        float(state.max_depth_bin))]

    t0 = time.time()
    losses = []
    for it in range(steps):
        batch = make_batch(rs)
        state, metrics = step_fn(state, batch, jax.random.fold_in(
            jax.random.PRNGKey(100 + seed), it))
        if (it + 1) % 10 == 0 or it == 0 or it + 1 == steps:
            m = jax.device_get(metrics)
            losses.append((it + 1, float(m["loss"])))
            log(f"step {it + 1}/{steps} loss {float(m['loss']):.4f} "
                f"bins [{float(m['depth_bins/min']):.2f}, "
                f"{float(m['depth_bins/max']):.2f}]")
            results["bins"].append(
                (it + 1, float(m["depth_bins/min"]),
                 float(m["depth_bins/max"])))
        if eval_every and (it + 1) % eval_every == 0:
            log(f"  metrics @{it + 1}: {eval_metrics(state)}")
    if not results["bins"] or results["bins"][-1][0] != steps:
        results["bins"].append((steps, float(state.min_depth_bin),
                                float(state.max_depth_bin)))
    results["losses"] = losses
    results["train_seconds"] = time.time() - t0

    m1 = eval_metrics(state)
    log(f"final metrics: {m1}")
    results["final"] = m1
    m1m = eval_metrics(state, multi=True)
    log(f"final metrics (student/multi): {m1m}")
    results["final_multi"] = m1m
    if return_eval:
        return results, state, eval_metrics
    if return_state:
        return results, state
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rep_size", default="t")
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--eval_frames", type=int, default=8)
    p.add_argument("--eval_every", type=int, default=0)
    p.add_argument("--compute_dtype", default="float32")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="")
    a = p.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    r = run_convergence(
        rep_size=a.rep_size, height=a.height, width=a.width, steps=a.steps,
        batch_size=a.batch_size, frames=a.frames, eval_frames=a.eval_frames,
        seed=a.seed, eval_every=a.eval_every, compute_dtype=a.compute_dtype,
        learning_rate=a.lr)
    print(json.dumps(r, indent=2, default=float))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(r, f, indent=2, default=float)


if __name__ == "__main__":
    main()
