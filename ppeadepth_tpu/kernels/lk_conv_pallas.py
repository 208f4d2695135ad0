"""Pallas TPU kernel: large-kernel (31x31/29/27/13) depthwise conv.

The TPU-native answer to the reference's optional CUDA implicit-GEMM
depthwise conv (replknet.py:20-37). Depthwise convs do ~k^2 MACs/pixel
with no channel reduction, so they are VPU work, not MXU work; the kernel
therefore optimises for data movement:

  * the input is spatially padded once in HBM;
  * the grid walks (batch, H-tiles); each step DMAs one
    [TH + k - 1, W + k - 1, C] halo window HBM -> VMEM;
  * accumulation happens in a f32 VMEM scratch (NOT a loop carry — a
    961-tap fori with a [TH, W, C] f32 carry blows Mosaic's register
    allocator, the round-1 hidden-HTTP-500 signature);
  * the tap loop is restructured as row bands: a dynamic fori over the k
    kernel rows loads each [TH, W + k - 1, C] band once, then a static
    unroll over the k columns accumulates lane-preserving shifted
    multiply-adds — each window row is read k times instead of k^2;
  * channels stay on the 128-wide lane axis the whole time; output is
    cast back to the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _choose_tile_h(H: int, W: int, C: int, k: int, dtype_bytes: int,
                   vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Largest TH (multiple of 8, <= H) whose window fits the budget."""
    for th in (64, 32, 16, 8):
        window = (th + k - 1) * (W + k - 1) * C * dtype_bytes
        out = th * W * C * 4
        if 2 * window + out <= vmem_budget and H % th == 0:
            return th
    return 8


def _dw_kernel(k, TH, W, C, x_hbm, w_ref, out_ref, win, acc, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * TH, TH + k - 1), :, :], win, sem
    )
    cp.start()
    cp.wait()

    acc[...] = jnp.zeros_like(acc)

    def row_body(ky, _):
        band = win[pl.ds(ky, TH)]          # [TH, W + k - 1, C]
        taps = w_ref[ky, :, 0, :]          # [k, C]
        for kx in range(k):                # static: shifted sublane slices
            acc[...] += (
                band[:, kx:kx + W, :].astype(jnp.float32)
                * taps[kx, :].astype(jnp.float32)
            )
        return 0

    jax.lax.fori_loop(0, k, row_body, 0)
    out_ref[0] = acc[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("padding",))
def depthwise_conv2d_pallas(x, w, padding: int):
    """x: [B, H, W, C]; w: [k, k, 1, C]; stride 1, 'same' padding k//2."""
    B, H, W, C = x.shape
    k = w.shape[0]
    assert padding == k // 2, "pallas path assumes same padding"

    xp = jnp.pad(
        x, ((0, 0), (padding, padding), (padding, padding), (0, 0))
    )
    # pad H to a multiple of the tile
    TH = _choose_tile_h(H, W, C, k, x.dtype.itemsize)
    Hp = ((H + TH - 1) // TH) * TH
    if Hp != H:
        xp = jnp.pad(xp, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))

    grid = (B, Hp // TH)
    out = pl.pallas_call(
        functools.partial(_dw_kernel, k, TH, W, C),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, C), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + k - 1, W + 2 * padding, C), x.dtype),
            pltpu.VMEM((TH, W, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * k * k,
            bytes_accessed=(
                xp.size * x.dtype.itemsize + B * Hp * W * C * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
    )(xp, w)
    if Hp != H:
        out = out[:, :H]
    return out
