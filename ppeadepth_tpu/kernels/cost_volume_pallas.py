"""EXPERIMENTAL pallas kernel for the plane-sweep cost volume.

This is the VMEM-resident design from kernels/README.md: per batch item
the whole lookup feature map (48x160x128xf32 = 3.9 MB) and the current
features live in VMEM; the kernel loops over depth bins, computes the
epipolar sample coordinates as elementwise VPU math off iota grids, and
accumulates the channel-mean |diff| directly — only the [D, h, w] cost
ever touches HBM (the XLA path writes 4x [N, 2, 2, C] gather patches,
~128x more traffic).

Status: semantically verified in interpret mode
(tests/test_cost_volume_pallas.py equivalence vs ops.cost_volume
_frame_diffs). NOT yet compilable by Mosaic on this environment — the
per-element 2D gather (`jnp.take` over the flattened spatial axis) has no
Mosaic lowering today, and this machine's remote-compile path is broken
anyway (CLAUDE.md). Kept as the reference implementation for the round-2
kernel push; wire-up point is ops.cost_volume._frame_diffs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(D, H, W, C, cur_ref, lk_ref, A_ref, t_ref, bins_ref, out_ref):
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    A = A_ref[0]
    t = t_ref[0]
    bx = A[0, 0] * gx + A[0, 1] * gy + A[0, 2]
    by = A[1, 0] * gx + A[1, 1] * gy + A[1, 2]
    bz = A[2, 0] * gx + A[2, 1] * gy + A[2, 2]

    cur = cur_ref[0]  # [H, W, C]
    lk_flat = lk_ref[0].reshape(H * W, C)

    border = (
        (gy >= 2) & (gy < H - 2) & (gx >= 2) & (gx < W - 2)
    ).astype(jnp.float32)

    def body(d, _):
        depth = bins_ref[d]
        x = (bx * depth + t[0]) / (bz * depth + t[2] + 1e-7)
        y = (by * depth + t[1]) / (bz * depth + t[2] + 1e-7)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0)[..., None]
        wy = (y - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def corner(yi, xi, w):
            v = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            g = jnp.take(lk_flat, idx.reshape(-1), axis=0).reshape(H, W, C)
            return g * (w * v.astype(jnp.float32)[..., None])

        warped = (
            corner(y0i, x0i, (1 - wx) * (1 - wy))
            + corner(y0i, x0i + 1, wx * (1 - wy))
            + corner(y0i + 1, x0i, (1 - wx) * wy)
            + corner(y0i + 1, x0i + 1, wx * wy)
        )
        diff = jnp.mean(jnp.abs(warped - cur), axis=-1)
        edge = (
            (x >= 2.0) & (x <= W - 2) & (y >= 2.0) & (y <= H - 2)
        ).astype(jnp.float32)
        out_ref[0, d] = diff * edge * border
        return 0

    jax.lax.fori_loop(0, D, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def frame_diffs_pallas(cur, lk, A, t, bins, interpret=True):
    """Edge-masked L1 diff volume for one lookup frame.

    cur/lk: [B, H, W, C]; A: [B, 3, 3]; t: [B, 3]; bins: [D].
    Returns [B, D, H, W]. interpret=True until Mosaic supports the gather.
    """
    B, H, W, C = cur.shape
    D = bins.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, D, H, W, C),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, D, H, W), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W), jnp.float32),
        interpret=interpret,
    )(cur, lk, A, t, bins)
