"""Gather-free plane-sweep cost volume on the MXU (pallas).

The production XLA path (ops/cost_volume.py:_frame_diffs) is HBM-gather
bound: every (bin, pixel) fetches a (2, 2, C) bilinear patch from the
lookup features — ~2.9 GB of gather traffic per lookup frame at KITTI
training shapes, running at ~13 GB/s effective (CLAUDE.md).  Mosaic has
no general dynamic-gather lowering (only within an 8-sublane tile), so
the obvious "gather from VMEM" kernel cannot compile.

This kernel removes the gather entirely.  Bilinear zeros-padding
interpolation is a linear map with separable hat-function weights:

    warped[n, c] = sum_y  max(0, 1-|y(n)-yi|) * sum_x max(0, 1-|x(n)-xi|)
                   * lk[yi, xi, c]

so per depth bin the inner sum over x is ONE matmul  wx[TN, W] @ lk[yi]
[W, C]  on the MXU, and the outer sum over y is a short accumulation
loop.  The y-loop only visits the dynamic band [floor(min y),
floor(max y)+1] actually touched by the tile's epipolar segment —
typically ~R+2 of H rows for an R-row output tile — so the dense
O(H) contraction collapses to the sparse work the gather would have
done, but as MXU FLOPs instead of random HBM traffic.  The lookup
feature map (48x160x128 f32 = 3.9 MB at KITTI shapes) stays VMEM-
resident across all bins of a batch item.

Semantics match ops/cost_volume.py:_frame_diffs exactly (same
projection math, eps=1e-7, zeros-padding bilinear = hat weights,
2px edge mask on sampled coords, 2px static border on the current
frame); see tests/test_cost_volume_mxu.py.  The reference computation
is replk_matching.py:127-206 (per-sample loop over grid_sample calls).

The cost volume is gradient-free in the reference (torch.no_grad);
callers stop_gradient the inputs (models/matching_encoder.py:121-128),
so no custom VJP is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(H, W, C, TN, BD, eps, precision, cur_ref, lk_ref, A_ref, t_ref,
            bins_ref, out_ref, acc_ref):
    nt = pl.program_id(1)

    # output pixel coordinates of this tile's TN = R*W pixels (row-major)
    n = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) + nt * TN
    gy_i = n // W
    gx_i = n - gy_i * W
    gx = gx_i.astype(jnp.float32)
    gy = gy_i.astype(jnp.float32)

    a00 = A_ref[0, 0, 0]
    a01 = A_ref[0, 0, 1]
    a02 = A_ref[0, 0, 2]
    a10 = A_ref[0, 1, 0]
    a11 = A_ref[0, 1, 1]
    a12 = A_ref[0, 1, 2]
    a20 = A_ref[0, 2, 0]
    a21 = A_ref[0, 2, 1]
    a22 = A_ref[0, 2, 2]
    t0 = t_ref[0, 0, 0]
    t1 = t_ref[0, 0, 1]
    t2 = t_ref[0, 0, 2]

    # bin-independent projection pieces: cam = (A @ pix) * depth + t
    bx = a00 * gx + a01 * gy + a02  # [TN, 1]
    by = a10 * gx + a11 * gy + a12
    bz = a20 * gx + a21 * gy + a22

    xi = jax.lax.broadcasted_iota(jnp.int32, (TN, W), 1).astype(jnp.float32)
    border = (
        (gy_i >= 2) & (gy_i < H - 2) & (gx_i >= 2) & (gx_i < W - 2)
    ).astype(jnp.float32)

    # Stack this step's BD bins along the matmul M axis: hat weights
    # wx[n, xi] = max(0, 1 - |x(n) - xi|) (exactly bilinear zeros-padding
    # interpolation along x) concatenate to WX [BD*TN, W] — TN is a
    # multiple of the 8-sublane tile, so the concat and the per-bin
    # slices below are layout-aligned (free).  One matmul per lookup row
    # then serves ALL BD bins (8x fewer MXU dispatches than the round-1
    # per-bin loop; measured overhead-bound at these sizes), with each
    # bin's y-hat riding along as aligned rows of Y.
    xs, ys, wxs = [], [], []
    for d in range(BD):
        depth = bins_ref[d, 0, 0]
        den = bz * depth + t2 + eps
        x = (bx * depth + t0) / den  # [TN, 1]
        y = (by * depth + t1) / den
        xs.append(x)
        ys.append(y)
        wxs.append(jnp.maximum(0.0, 1.0 - jnp.abs(x - xi)))
    WX = jnp.concatenate(wxs, axis=0).astype(lk_ref.dtype)  # [BD*TN, W]
    Y = jnp.concatenate(ys, axis=0)                         # [BD*TN, 1]

    # dynamic y band: union over the BD bins (adjacent bins' epipolar
    # segments are close, so the union stays a few rows)
    y_safe = jnp.where(jnp.isfinite(Y), Y, 0.0)
    y_lo = jnp.clip(jnp.floor(jnp.min(y_safe)), 0.0, H - 1).astype(
        jnp.int32)
    y_hi = jnp.minimum(
        jnp.clip(jnp.floor(jnp.max(y_safe)), 0.0, H - 1).astype(
            jnp.int32) + 2,
        H,
    )

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def y_body(yi, _):
        lkrow = lk_ref[0, yi]  # [W, C]
        r = jnp.dot(WX, lkrow, preferred_element_type=jnp.float32,
                    precision=precision)  # [BD*TN, C]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(Y - yi))  # [BD*TN, 1]
        acc_ref[...] += wy * r
        return 0

    jax.lax.fori_loop(y_lo, y_hi, y_body, 0)

    # per-bin L1 diff, edge-masked; bins land on the LANE axis of the
    # output block ([TN, BD], i.e. [B, HW, D] overall) so the cost
    # volume leaves the kernel D-minor — the layout every consumer
    # (elementwise aggregation, lane-reductions over D, the NHWC concat
    # into reduce_conv) wants. The previous [B, D, HW, 1] form made XLA
    # insert a ~12 GB/s HBM relayout copy of the whole volume right
    # after the custom call (4.1 ms at deploy B=8, round-3 VERDICT #5).
    cols = []
    for d in range(BD):
        a = acc_ref[d * TN:(d + 1) * TN]
        diff = jnp.mean(jnp.abs(a - cur_ref[0]), axis=1,
                        keepdims=True)  # [TN, 1]
        edge = (
            (xs[d] >= 2.0) & (xs[d] <= W - 2)
            & (ys[d] >= 2.0) & (ys[d] <= H - 2)
        ).astype(jnp.float32)
        cols.append(diff * edge * border)
    out_ref[0] = jnp.concatenate(cols, axis=1)  # [TN, BD]


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_tile", "interpret", "precision",
                     "bins_per_step", "compute_dtype"),
)
def frame_diffs_batch(cur_flat, lk_img, A, t, bins, rows_per_tile=2,
                      interpret=False, precision="default",
                      bins_per_step=None, compute_dtype="bfloat16"):
    """Edge-masked L1 diff volume for one lookup frame, whole batch.

    cur_flat: [B, HW, C]; lk_img: [B, H, W, C]; A: [B, 3, 3]; t: [B, 3];
    bins: [D].  Returns [B, D, H, W] float32 — bit-compatible with
    vmap(_frame_diffs) from ops/cost_volume.py on finite inputs.
    """
    B, H, W, C = lk_img.shape
    D = bins.shape[0]
    if H % rows_per_tile:
        raise ValueError(f"H={H} not divisible by rows_per_tile={rows_per_tile}")
    TN = rows_per_tile * W
    NT = H // rows_per_tile
    lk_dt = jnp.dtype(compute_dtype)  # matmul operand dtype; f32 accumulate
    if bins_per_step is None:
        # measured sweep (tools/probe_cv.py, BENCHMARKS.md): 32 is the
        # fastest compiling stack for bf16 operands (33.8 vs 36.6 ms at
        # (2,8)); f32 operands double the per-step VMEM and 32 exceeds
        # Mosaic's scoped-vmem limit at KITTI shapes — cap at 8 there
        # (the round-2 default, known to fit).
        bins_per_step = 32 if lk_dt == jnp.bfloat16 else 8
    # largest divisor of D that is <= bins_per_step (a non-dividing
    # bins_per_step must not silently fall to BD=1 — that is ~10x slower)
    BD = next(c for c in range(min(bins_per_step, D), 0, -1) if D % c == 0)
    DC = D // BD

    out = pl.pallas_call(
        functools.partial(_kernel, H, W, C, TN, BD, 1e-7,
                          jax.lax.Precision(precision)),
        grid=(B, NT, DC),
        in_specs=[
            pl.BlockSpec((1, TN, C), lambda b, nt, d: (b, nt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda b, nt, d: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3), lambda b, nt, d: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 3), lambda b, nt, d: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BD, 1, 1), lambda b, nt, d: (d, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        # D-minor output with conforming blocks: Mosaic requires the
        # block's last dim to be 128-divisible or equal to the array's
        # (BD=32 is neither for a [B, HW, D] array), so the d-chunk
        # index folds into the ROW axis instead — block (1, TN, BD)
        # over [B, HW*DC, BD] — and the wrapper un-interleaves rows
        # with a lane-preserving permute (cheap; the lanes stay put).
        out_specs=pl.BlockSpec((1, TN, BD),
                               lambda b, nt, d: (b, nt * DC + d, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * W * DC, BD), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BD * TN, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cur_flat.astype(jnp.float32), lk_img.astype(lk_dt),
      A.astype(jnp.float32), t.astype(jnp.float32).reshape(B, 1, 3),
      bins.astype(jnp.float32).reshape(D, 1, 1))
    # un-interleave the d-chunks from the row axis: [B, NT, DC, TN, BD]
    # -> [B, NT, TN, DC, BD] == [B, HW, D] (lane-preserving permute),
    # then a LOGICAL transpose to the [B, D, H, W] API shape — with the
    # volume now D-minor, XLA's layout assignment keeps the downstream
    # elementwise chain and the final NHWC form in the same (B,H,W,D)
    # memory order, so no ~12 GB/s relayout copy of the whole volume
    # follows the custom call any more (round-3 VERDICT #5: 4.1 ms at
    # deploy B=8).
    out = out.reshape(B, NT, DC, TN, BD).transpose(0, 1, 3, 2, 4)
    return jnp.transpose(out.reshape(B, H, W, D), (0, 3, 1, 2))
