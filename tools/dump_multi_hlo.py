#!/usr/bin/env python
"""Dump the optimized HLO of the student multi-frame deploy path
(serve.InferenceSession.predict_depth_multi) to cross-reference profiler
fusion/copy names against source ops.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/dump_multi_hlo.py /tmp/multi.hlo
"""

import os
import sys


def main():
    out_path = sys.argv[1]
    import jax
    import numpy as np
    import jax.numpy as jnp

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from ppeadepth_tpu.options import Config
    from ppeadepth_tpu.serve import InferenceSession

    B, H, W = 8, 192, 640
    opt = Config(adapter=True, rep_size="b", adpt_test=4,
                 height=H, width=W, compute_dtype="bfloat16")
    sess = InferenceSession(opt)
    rng = np.random.RandomState(0)
    img = rng.rand(B, H, W, 3).astype(np.float32)
    lookup = rng.rand(B, H, W, 3).astype(np.float32)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * W / 4, 1.92 * H / 4
    K[0, 2], K[1, 2] = 0.5 * W / 4, 0.5 * H / 4
    K = np.tile(K, (B, 1, 1))
    invK = np.linalg.pinv(K[0])[None].repeat(B, 0)
    sess.predict_depth_multi(img, lookup, K, invK)  # builds _multi_fn

    lowered = sess._multi_fn.lower(
        sess.variables, jnp.asarray(img), jnp.asarray(lookup),
        jnp.asarray(K), jnp.asarray(invK),
        jnp.asarray(0.1, jnp.float32), jnp.asarray(10.0, jnp.float32))
    txt = lowered.compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")


if __name__ == "__main__":
    main()
