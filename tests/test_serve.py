"""Inference session e2e: merged deploy model, all three predict paths."""

import numpy as np

from ppeadepth_tpu.options import Config
from ppeadepth_tpu.serve import InferenceSession

OPT = Config(adapter=True, rep_size="t", use_checkpoint=False,
             height=64, width=96, num_depth_bins=8, bin_chunk=4)


def test_inference_session(rng):
    sess = InferenceSession(OPT, merge_reparam=True, dtype="float32")
    imgs = rng.rand(2, 64, 96, 3).astype(np.float32)
    prev = rng.rand(2, 64, 96, 3).astype(np.float32)

    depth = sess.predict_depth(imgs)
    assert depth.shape == (2, 64, 96)
    assert np.isfinite(depth).all()
    assert depth.min() >= OPT.min_depth - 1e-3
    assert depth.max() <= OPT.max_depth + 1e-3

    T = sess.predict_pose(prev, imgs, invert=True)
    assert T.shape == (2, 4, 4)
    np.testing.assert_allclose(T[:, 3], [[0, 0, 0, 1]] * 2, atol=1e-6)

    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 14.0, 30.0, 12.0, 8.0
    depth_m = sess.predict_depth_multi(
        imgs, prev, np.stack([K] * 2), np.stack([np.linalg.pinv(K)] * 2)
    )
    assert depth_m.shape == (2, 64, 96)
    assert np.isfinite(depth_m).all()

    # uint8 input accepted
    d2 = sess.predict_depth((imgs * 255).astype(np.uint8))
    np.testing.assert_allclose(d2, depth, rtol=0.05, atol=0.5)
