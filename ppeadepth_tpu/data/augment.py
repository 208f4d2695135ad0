"""Device-side (jit-compatible) augmentation + pyramid pipeline.

The reference does per-item CPU augmentation in DataLoader workers
(mono_dataset.py:89-190). On TPU the host decode should only produce
full-res frames; jitter / flip / the multi-scale pyramid and the
per-scale intrinsics all run on device inside the train step's jit —
this is the "device-side preprocessing pipeline" of BASELINE.json.

Semantics mirrored:
  - ONE jitter (brightness/contrast/saturation in [0.8,1.2], hue ±0.1,
    random order) per item, shared across all frames (the pose net must
    see consistent appearance);
  - 50% chance of jitter, 50% of horizontal flip, per item;
  - blank (all-zero) frames stay zero in color_aug;
  - intrinsics at scale s: K[0]*W/2^s, K[1]*H/2^s; like the reference,
    K is NOT mirrored under flips (KITTI's normalised cx is exactly 0.5
    so flips are intrinsics-safe; the reference applies the same rule to
    CityScapes — kept for parity).

Differences (documented): device resize is bilinear (jax.image) rather
than PIL LANCZOS — an anti-aliasing difference on downscale only; the
hue shift operates in a vectorised HSV approximation rather than PIL's
8-bit HSV round-trip.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    diff = maxc - minc
    s = jnp.where(maxc > 0, diff / jnp.maximum(maxc, 1e-8), 0.0)
    diff_safe = jnp.maximum(diff, 1e-8)
    rc = (maxc - r) / diff_safe
    gc = (maxc - g) / diff_safe
    bc = (maxc - b) / diff_safe
    h = jnp.where(
        maxc == r, bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(diff > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(img, factors):
    """img: [..., H, W, 3] in [0,1]; factors: dict with per-item scalars
    broadcastable to the batch: brightness, contrast, saturation (around
    1.0), hue (in turns, ±0.1), order [4] permutation."""
    def apply_op(idx, x):
        b = factors["brightness"]
        c = factors["contrast"]
        s = factors["saturation"]
        hshift = factors["hue"]

        def brightness(x):
            return x * b

        def contrast(x):
            # torchvision: blend with the mean of the grayscale image
            gray = (0.299 * x[..., 0] + 0.587 * x[..., 1]
                    + 0.114 * x[..., 2])
            mean = jnp.mean(gray, axis=(-2, -1), keepdims=True)[..., None]
            return c * x + (1 - c) * mean

        def saturation(x):
            gray = (0.299 * x[..., 0] + 0.587 * x[..., 1]
                    + 0.114 * x[..., 2])[..., None]
            return s * x + (1 - s) * gray

        def hue(x):
            hsv = _rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
            hsv = hsv.at[..., 0].set((hsv[..., 0] + hshift) % 1.0)
            return _hsv_to_rgb(hsv)

        return jax.lax.switch(idx, [brightness, contrast, saturation, hue], x)

    x = img
    for k in range(4):
        x = apply_op(factors["order"][k], x)
        x = jnp.clip(x, 0.0, 1.0)
    return x


def sample_jitter_factors(rng, batch: int):
    """Per-item jitter params + apply/flip coins, shaped [B, ...]."""
    ks = jax.random.split(rng, 7)
    return {
        "brightness": jax.random.uniform(ks[0], (batch,), minval=0.8, maxval=1.2),
        "contrast": jax.random.uniform(ks[1], (batch,), minval=0.8, maxval=1.2),
        "saturation": jax.random.uniform(ks[2], (batch,), minval=0.8, maxval=1.2),
        "hue": jax.random.uniform(ks[3], (batch,), minval=-0.1, maxval=0.1),
        "order": jax.vmap(
            lambda k: jax.random.permutation(k, 4)
        )(jax.random.split(ks[4], batch)),
        "do_jitter": jax.random.uniform(ks[5], (batch,)) > 0.5,
        "do_flip": jax.random.uniform(ks[6], (batch,)) > 0.5,
    }


def augment_batch(
    frames: Dict[int, jnp.ndarray],
    K_full,
    rng,
    height: int,
    width: int,
    num_scales: int = 4,
    color_scales: int | None = None,
) -> Dict:
    """Device-side replacement for MonoDataset.preprocess.

    frames: {frame_id: [B, H, W, 3]} full-res (already resized to
    (height, width) scale 0 by the host decode). K_full: [B, 4, 4]
    *normalised* intrinsics. Returns the standard batch dict with
    ('color'/'color_aug', f, s) for s < color_scales (default: all
    num_scales) and ('K'/'inv_K', s) for s < num_scales.

    The training step consumes only scale-0 colors (+ K at scales 0/2);
    passing color_scales=1 skips materializing the unused image pyramids
    (~35 MB/batch at KITTI bs 12 — they were costing device memory and,
    on the classic loader, H2D bandwidth).
    """
    if color_scales is None:
        color_scales = num_scales
    B = next(iter(frames.values())).shape[0]
    factors = sample_jitter_factors(rng, B)
    flip = factors["do_flip"][:, None, None, None]

    out = {}
    for f, img in frames.items():
        img = jnp.where(flip, img[:, :, ::-1, :], img)
        blank = (jnp.sum(img, axis=(1, 2, 3), keepdims=False) == 0)

        def jit_one(im, fac):
            one = {k: v for k, v in fac.items()
                   if k not in ("do_jitter", "do_flip")}
            return color_jitter(im, one)

        jittered = jax.vmap(jit_one)(
            img,
            {k: factors[k] for k in
             ("brightness", "contrast", "saturation", "hue", "order")},
        )
        use_jit = factors["do_jitter"] & ~blank
        aug = jnp.where(use_jit[:, None, None, None], jittered, img)
        aug = jnp.where(blank[:, None, None, None], 0.0, aug)
        prev_c, prev_a = img, aug
        for s in range(color_scales):
            h, w = height // 2 ** s, width // 2 ** s
            if s == 0:
                cs, as_ = img, aug
            else:
                cs = jax.image.resize(prev_c, (B, h, w, 3), "linear")
                as_ = jax.image.resize(prev_a, (B, h, w, 3), "linear")
            out[("color", f, s)] = cs
            out[("color_aug", f, s)] = jnp.where(
                blank[:, None, None, None], 0.0, as_
            )
            prev_c, prev_a = cs, as_

    for s in range(num_scales):
        K = K_full.copy()
        K = K.at[:, 0, :].multiply(width // 2 ** s)
        K = K.at[:, 1, :].multiply(height // 2 ** s)
        out[("K", s)] = K
        out[("inv_K", s)] = jnp.linalg.pinv(K)
    return out
