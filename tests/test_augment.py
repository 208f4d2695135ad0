"""Device-side augmentation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ppeadepth_tpu.data import augment as A


def test_color_jitter_identity():
    img = jnp.asarray(np.random.RandomState(0).rand(8, 12, 3), np.float32)
    factors = {
        "brightness": jnp.asarray(1.0), "contrast": jnp.asarray(1.0),
        "saturation": jnp.asarray(1.0), "hue": jnp.asarray(0.0),
        "order": jnp.arange(4),
    }
    out = A.color_jitter(img, factors)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_color_jitter_brightness():
    img = jnp.full((4, 4, 3), 0.4)
    factors = {
        "brightness": jnp.asarray(1.2), "contrast": jnp.asarray(1.0),
        "saturation": jnp.asarray(1.0), "hue": jnp.asarray(0.0),
        "order": jnp.arange(4),
    }
    out = A.color_jitter(img, factors)
    np.testing.assert_allclose(np.asarray(out), 0.48, atol=1e-5)


def test_hsv_roundtrip(rng):
    img = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    back = A._hsv_to_rgb(A._rgb_to_hsv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-4)


def test_augment_batch_schema(rng):
    B, H, W = 4, 64, 96
    frames = {
        f: jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
        for f in (0, -1, 1)
    }
    # one blank frame in the batch
    frames[-1] = frames[-1].at[1].set(0.0)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 0.58, 1.92, 0.5, 0.5
    Kb = jnp.asarray(np.stack([K] * B))
    out = jax.jit(
        lambda fr, k, r: A.augment_batch(fr, k, r, H, W, 4)
    )(frames, Kb, jax.random.PRNGKey(0))
    for f in (0, -1, 1):
        for s in range(4):
            assert out[("color", f, s)].shape == (
                B, H // 2 ** s, W // 2 ** s, 3
            )
    # blank frame stays blank in aug at every scale
    for s in range(4):
        assert float(jnp.sum(out[("color_aug", -1, s)][1])) == 0.0
    # intrinsics scaled per level
    np.testing.assert_allclose(
        np.asarray(out[("K", 2)][0, 0, 0]), 0.58 * (W // 4), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out[("K", 0)] @ out[("inv_K", 0)]),
        np.broadcast_to(np.eye(4), (B, 4, 4)), atol=1e-4,
    )
    # values stay in range
    assert float(out[("color_aug", 0, 0)].min()) >= 0.0
    assert float(out[("color_aug", 0, 0)].max()) <= 1.0


def test_flip_applied_per_item(rng):
    B, H, W = 8, 16, 24
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    out = A.augment_batch({0: img}, jnp.broadcast_to(jnp.eye(4), (B, 4, 4)),
                          jax.random.PRNGKey(1), H, W, 1)
    col = np.asarray(out[("color", 0, 0)])
    orig = np.asarray(img)
    flipped = orig[:, :, ::-1, :]
    per_item = [
        np.allclose(col[i], orig[i]) or np.allclose(col[i], flipped[i])
        for i in range(B)
    ]
    assert all(per_item)
    assert any(np.allclose(col[i], flipped[i]) and not
               np.allclose(col[i], orig[i]) for i in range(B))


def test_color_scales_trim(rng):
    """color_scales=1 (the train-batch memory trim) must emit only the
    scale-0 colors while keeping K/inv_K at every scale, and match the
    full-pyramid output at scale 0 exactly."""
    B, H, W = 4, 32, 64
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    K = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    key = jax.random.PRNGKey(2)
    full = A.augment_batch({0: img}, K, key, H, W, 4)
    trim = A.augment_batch({0: img}, K, key, H, W, 4, color_scales=1)
    for s in range(4):
        assert ("K", s) in trim and ("inv_K", s) in trim
    assert ("color", 0, 0) in trim and ("color", 0, 1) not in trim
    assert ("color_aug", 0, 1) not in trim
    np.testing.assert_array_equal(
        np.asarray(trim[("color_aug", 0, 0)]),
        np.asarray(full[("color_aug", 0, 0)]),
    )
