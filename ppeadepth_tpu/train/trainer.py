"""Training orchestrator (the Trainer of trainer.py:83-418, TPU-native).

Differences from the reference by design:
  - one jitted train step contains forward/loss/grads/update/bin-EMA;
  - data parallelism is a dp mesh (batch sharded, state replicated) —
    no accelerate/DDP wrapper, no barriers;
  - validation shards over the mesh instead of running on rank 0 only;
  - logging is stdout + metrics.jsonl (wandb-free by default).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import data as D
from ..ckpt import io as ckpt_io
from ..eval import evaluator, metrics as M
from ..models import RepDepth
from ..options import Config
from ..parallel import mesh as mesh_lib
from . import freeze, schedule
from . import step as step_mod
from .step import create_train_state, make_train_step


def readlines(path):
    with open(path) as f:
        return [line.rstrip() for line in f if line.rstrip()]


def synthetic_batch(opt: Config, B: int):
    """Shape-only batch for model init (no data needed)."""
    rng = np.random.RandomState(0)
    H, W = opt.height, opt.width
    batch = {}
    for f in opt.frame_ids:
        img = rng.rand(B, H, W, 3).astype(np.float32)
        batch[("color", f, 0)] = jnp.asarray(img)
        batch[("color_aug", f, 0)] = jnp.asarray(img)
    for s in range(4):
        K = np.eye(4, dtype=np.float32)
        sc = 2 ** s
        K[0, 0], K[1, 1] = 0.58 * W / sc, 1.92 * H / sc
        K[0, 2], K[1, 2] = 0.5 * W / sc, 0.5 * H / sc
        batch[("K", s)] = jnp.asarray(np.stack([K] * B))
        batch[("inv_K", s)] = jnp.asarray(np.stack([np.linalg.pinv(K)] * B))
    return batch


class Trainer:
    def __init__(self, opt: Config, splits_dir: str = "./splits",
                 donate_batch: bool = True):
        """donate_batch=True donates the batch buffers to the jitted step
        (the loader loop feeds a FRESH batch every step). Pass False when
        reusing trainer.step_fn with a re-fed batch (overfit/debug loops)
        — a donated batch's buffers are deleted after the first call."""
        self.opt = opt = opt.with_mode_presets()
        self.splits_dir = splits_dir
        self.log_path = os.path.join(opt.log_dir, opt.name)
        os.makedirs(self.log_path, exist_ok=True)

        self.mesh = mesh_lib.make_mesh()
        n_dev = self.mesh.devices.size
        assert opt.batch_size % n_dev == 0 or n_dev == 1, (
            f"batch_size {opt.batch_size} not divisible by {n_dev} devices"
        )

        # Measured (BENCHMARKS.md): with --remat_pose (default) +
        # --frozen_bf16 the bs-12 no-remat step fits a 16 GB v5e with
        # ~650 MB of headroom (AOT temps 13.8 GB + 1.3 GB args) and runs
        # 24.7 imgs/s sharded vs 22.9 with --remat_loss — so remat_loss
        # is only auto-enabled past per-device bs 12 now. Without
        # remat_pose the round-3 thresholds apply (OOM at bs 11 by
        # 168 MB): auto-enable from bs 11.
        auto_remat_bs = 13 if opt.remat_pose else 11
        per_dev_micro = opt.batch_size // max(n_dev, 1) // opt.grad_accum
        if (jax.default_backend() == "tpu" and not opt.use_checkpoint
                and not opt.remat_loss
                and per_dev_micro >= auto_remat_bs
                and not os.environ.get("PPEA_NO_AUTO_REMAT")):
            print(f"[trainer] per-device batch >= {auto_remat_bs} without"
                  " --use_checkpoint: auto-enabling --remat_loss"
                  " (full-trainer OOM guard; pass --use_checkpoint or"
                  " PPEA_NO_AUTO_REMAT=1 to opt out)")
            self.opt = opt = opt.replace(remat_loss=True)

        # datasets
        frames_to_load = list(opt.frame_ids)
        for idx in opt.matching_ids:
            if idx not in frames_to_load:
                frames_to_load.append(idx)
        self.val_frames_to_load = [0, -1]

        self.train_loader = self.val_loader = None
        if opt.data_path:
            ds_cls = D.DATASETS[opt.dataset]
            fpath = os.path.join(splits_dir, opt.split, "{}_files.txt")
            train_files = readlines(fpath.format("train"))
            test_files = readlines(fpath.format("test"))
            img_ext = ".png" if opt.png else ".jpg"
            train_ds = ds_cls(
                opt.data_path, train_files, opt.height, opt.width,
                frames_to_load, 4, is_train=True, img_ext=img_ext,
            )
            val_path = opt.data_path
            val_cls = ds_cls
            if opt.dataset != "kitti":
                val_cls = D.DATASETS["cityscapes_eval"]
                val_path = opt.cs_eval_path
            val_ds = val_cls(
                val_path, test_files, opt.height, opt.width,
                self.val_frames_to_load, 4, is_train=False, img_ext=img_ext,
            )
            if opt.fast_pipeline:
                from ..data import native_loader as NL
                from ..data.fast_pipeline import FastDecodePipeline

                assert NL.available(), "--fast_pipeline needs the native loader"
                frames_needed = sorted(set(frames_to_load))
                self.train_loader = FastDecodePipeline(
                    train_ds, opt.batch_size, frames_needed,
                    shuffle=True, n_threads=opt.num_workers,
                    cache_dir=opt.decode_cache,
                )
            else:
                self.train_loader = D.DataLoader(
                    train_ds, opt.batch_size, shuffle=True,
                    num_workers=opt.num_workers,
                )
            self.val_loader = D.DataLoader(
                val_ds, opt.batch_size, shuffle=False,
                num_workers=opt.num_workers, drop_last=False,
            )
            self.steps_per_epoch = len(self.train_loader)
        else:
            self.steps_per_epoch = 1000  # synthetic / smoke mode

        # model + state
        self.model = RepDepth(opt)
        init_batch = synthetic_batch(opt, 2)
        variables = jax.jit(
            lambda: self.model.init(
                {"params": jax.random.PRNGKey(0),
                 "droppath": jax.random.PRNGKey(1),
                 "aug": jax.random.PRNGKey(2)},
                init_batch, 0.1, 10.0, False,
            )
        )()
        # from-scratch runs bootstrap from ImageNet weights, like the
        # reference's constructor-time loads (repdepth.py:84-111,155);
        # resuming from a checkpoint supersedes the bootstrap
        if opt.weights_init == "pretrained" and not opt.load_weights_folder:
            from ..ckpt.torch_import import bootstrap_pretrained

            variables = bootstrap_pretrained(variables, opt)
        lr = 1e-6 if opt.freeze_pose else opt.learning_rate
        self.tx = schedule.make_optimizer(
            lr, self.steps_per_epoch, opt.scheduler_step_size
        )
        self.state = create_train_state(self.model, variables, opt, self.tx)

        labels = freeze.param_labels(variables["params"], opt)
        freeze.print_num_param(variables["params"], labels)

        # pristine f32 host copy of the (bf16-stored) frozen partition —
        # checkpoints save f32 regardless of --frozen_bf16
        self._frozen_f32 = None
        if step_mod.resolve_frozen_bf16(opt):
            _, frozen_f32 = freeze.partition(variables["params"], labels)
            self._frozen_f32 = {k: np.asarray(v)
                                for k, v in frozen_f32.items()}

        if opt.load_weights_folder:
            self.load_model(opt.load_weights_folder)

        self.state = mesh_lib.replicate(self.state, self.mesh)
        # NOTE round-3 measurement: fusing the device-side augment INTO
        # the step (prepare_fn inside make_train_step) was tried and
        # REVERTED — as in-program temps the [B,H,W,3] color tensors get
        # padded tiled layouts and the bs-12 no-remat step needs 16.12 GB
        # (+0.4 GB vs the two-jit split, OOM on a 16 GB v5e). As jit
        # boundary buffers they keep compact layouts. See BENCHMARKS.md.
        self.step_fn = make_train_step(self.model, opt, self.tx,
                                       donate_batch=donate_batch)
        self.base_rng = jax.random.PRNGKey(opt.pytorch_random_seed or 0)
        self._metrics_file = open(
            os.path.join(self.log_path, "metrics.jsonl"), "a"
        )
        self._wandb = None
        if os.environ.get("PPEA_WANDB"):
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project="ppeadepth_tpu", name=opt.name,
                           config=opt.__dict__)
            except Exception as e:
                print(f"[trainer] wandb unavailable: {e}")

    # ------------------------------------------------------------------ #

    def load_model(self, folder: str):
        # template upcast: with --frozen_bf16 the live frozen leaves are
        # bf16, but checkpoints store f32 and merge_into casts loaded
        # values to the template dtype — load against f32 so the pristine
        # copy keeps full precision, then re-apply the storage cast.
        template = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if a.dtype == jnp.bfloat16 else a, self.state.params)
        params, stats, track = ckpt_io.load_model(
            folder, template, self.state.batch_stats
        )
        labels = freeze.param_labels(params, self.opt)
        trainable, frozen = freeze.partition(params, labels)
        if step_mod.resolve_frozen_bf16(self.opt):
            self._frozen_f32 = {k: np.asarray(v) for k, v in frozen.items()}
            frozen = step_mod.cast_frozen_storage(frozen, self.opt)
        opt_state = self.state.opt_state
        if not self.opt.ktf:  # --ktf skips track/adam (trainer.py:151)
            opt_state = ckpt_io.load_adam(folder, self.state.opt_state)
        self.state = self.state.replace(
            trainable=trainable, frozen=frozen, batch_stats=stats,
            min_depth_bin=jnp.asarray(
                track.get("min_depth_bin", 0.1), jnp.float32),
            max_depth_bin=jnp.asarray(
                track.get("max_depth_bin", 10.0), jnp.float32),
            opt_state=opt_state,
        )
        print(f"loaded checkpoint from {folder} "
              f"(bins {float(self.state.min_depth_bin):.3f}"
              f"/{float(self.state.max_depth_bin):.3f})")

    def save_model(self, suffix: str):
        folder = os.path.join(self.log_path, f"{self.opt.name}_{suffix}")
        ckpt_io.save_checkpoint(folder, self.state, self.opt,
                                frozen_f32=self._frozen_f32)
        print(f"saved checkpoint to {folder}")
        return folder

    def log_metrics(self, step: int, metrics: dict, prefix: str = "train"):
        rec = {"step": step, "prefix": prefix}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._metrics_file.write(json.dumps(rec) + "\n")
        self._metrics_file.flush()
        if self._wandb is not None:
            self._wandb.log(
                {f"{prefix}/{k}": v for k, v in rec.items()
                 if k not in ("step", "prefix")},
                step=step,
            )

    # ------------------------------------------------------------------ #

    def train(self):
        opt = self.opt
        assert self.train_loader is not None, "--data_path required to train"
        step = int(jax.device_get(self.state.step))
        t_last = time.perf_counter()
        prepare = None
        if opt.fast_pipeline:
            from ..data.fast_pipeline import prepare_batch

            # color_scales=1: the train step reads only scale-0 colors;
            # the pyramids would cost ~35 MB/batch of device memory
            prepare = jax.jit(
                lambda fr, k, r: prepare_batch(
                    fr, k, r, opt.height, opt.width, 4, 1
                )
            )
        stack = None
        if opt.grad_accum > 1:
            # own jit: the stacked batch must cross the step boundary as
            # a compact argument (see step.stack_microbatches)
            stack = jax.jit(
                lambda b: step_mod.stack_microbatches(b, opt.grad_accum))
        start_epoch = step // max(self.steps_per_epoch, 1)
        for epoch in range(start_epoch, opt.num_epochs):
            self.train_loader.set_epoch(epoch)
            it = iter(self.train_loader)
            if prepare is None:
                # classic loader: drop the host-built color pyramids the
                # step never reads (scale >= 1) before H2D transfer
                it = (
                    {k: v for k, v in b.items()
                     if not (isinstance(k, tuple) and k[0] in
                             ("color", "color_aug") and k[2] > 0)}
                    for b in it
                )
            it = D.device_prefetch(it, self.mesh)
            for batch in it:
                rng = jax.random.fold_in(self.base_rng, step)
                if prepare is not None:
                    frames, K = batch
                    rng, rng_aug = jax.random.split(rng)
                    batch = prepare(frames, K, rng_aug)
                if stack is not None:
                    batch = stack(batch)
                self.state, metrics = self.step_fn(self.state, batch, rng)
                step += 1
                if step == 250 and opt.validate_every > 0:
                    # early validation snapshot (trainer.py:366-381)
                    self.validate(step)
                if step % 50 == 0:
                    metrics = jax.device_get(metrics)
                    dt = time.perf_counter() - t_last
                    ips = 50 * opt.batch_size / dt
                    t_last = time.perf_counter()
                    print(f"epoch {epoch} step {step} "
                          f"loss {metrics['loss']:.4f} {ips:.1f} img/s")
                    self.log_metrics(step, metrics)
                if opt.validate_every > 0 and step % opt.validate_every == 0:
                    self.validate(step)
                    self.save_model(f"s{step}")
        self.save_model("final")

    def validate(self, step: int):
        if self.val_loader is None:
            return None
        errors, mono_errors = evaluator.run_eval(
            self.model,
            {"params": self.state.params,
             "batch_stats": self.state.batch_stats},
            self.opt, iter(self.val_loader),
            min_bin=self.state.min_depth_bin,
            max_bin=self.state.max_depth_bin,
            with_teacher=not self.opt.freeze_teacher_and_pose,
            splits_dir=self.splits_dir,
            mesh=self.mesh,
        )
        print(f"[val @ {step}]\n" + M.format_metrics(errors))
        self.log_metrics(
            step, dict(zip(M.METRIC_NAMES, errors)), prefix="val"
        )
        if mono_errors is not None:
            print("[val mono]\n" + M.format_metrics(mono_errors))
            self.log_metrics(
                step, dict(zip(M.METRIC_NAMES, mono_errors)),
                prefix="val_mono",
            )
        return errors
