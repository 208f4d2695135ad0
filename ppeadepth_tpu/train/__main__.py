"""CLI launcher: `python -m ppeadepth_tpu.train <flags>`.

Accepts the reference's live flag surface (README.md:40-56):
  stage 1:  --adapter --use_checkpoint --data_path P --num_epochs N ...
  stage 2:  --train_cs --dc --adapter --use_checkpoint --learning_rate 1e-5
  eval:     --eval --load_weights_folder P [--rep_size l]

No `accelerate launch`: all local devices form the dp mesh automatically;
multi-host runs call jax.distributed.initialize() first (set
PPEA_DISTRIBUTED=1).
"""

from __future__ import annotations

import os
import sys


def seed_all(seed):
    import random

    import numpy as np

    if seed is not None:
        random.seed(seed)
        np.random.seed(seed)


def main(argv=None):
    from ..options import parse_args

    opt = parse_args(argv)
    seed_all(opt.pytorch_random_seed)

    import jax

    # persistent compile cache: full-model train steps take ~6 min to
    # compile cold on tunneled TPU backends, <5 s cached
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if os.environ.get("PPEA_DISTRIBUTED"):
        jax.distributed.initialize()

    if opt.lk_backend != "lax":
        from ..kernels import lk_conv

        lk_conv.set_backend(opt.lk_backend)

    if opt.eval:
        from ..evaluate_depth import evaluate

        evaluate(opt)
        return

    from .trainer import Trainer

    Trainer(opt).train()


if __name__ == "__main__":
    main(sys.argv[1:])
