"""Gather-free bilinear image warp (border mode) on the MXU, with a
custom VJP to the sample coordinates.

The photometric warp (train/step.py:_warp_frames -> ops/sampling.
grid_sample, reference trainer.py:904-914) is the train step's second
gather bottleneck after the cost volume: at KITTI shapes each warp
bilinear-gathers a (2,2,3) patch per full-res pixel, and its coordinate
gradient reuses the same corner gathers — profiled as 16 near-identical
~10 ms "custom fusion" HLOs, ~27% of the 624 ms step.

Design (differs from kernels/cost_volume_mxu.py's hat-matmul in two
load-bearing ways):

1. **Exact indicator decomposition instead of hat weights.**  Border
   bilinear along x is `(1-f) * v(fx) + f * v(fx1)` with `fx =
   floor(clamp(x))`, `fx1 = min(fx+1, W-1)`, `f = frac`.  The kernel
   builds 0/1 indicator matrices `I0[xi,n] = (xi == fx(n))`, `I1[xi,n] =
   (xi == fx1(n))` and computes the row selections as TWO bf16 MXU
   matmuls `img_row [C,W] @ I{0,1} [W,W]`.  0/1 entries are exact in
   bf16, so unlike a bf16 hat matmul there is no weight-rounding error
   and no near-lattice sign instability; the only inexactness is the
   image operand's bf16 rounding (~4e-3 — the same magnitude as the
   8-bit source quantization; mm_dtype="float32" + precision="highest"
   gives the exact-mode used by tests).  The fractional blend and the
   hat weights along y stay in f32 on the VPU.
   Bonus: d warped/dx = (A1 - A0) * hat_y — the difference of the two
   matmuls already computed — which reproduces torch's one-sided
   bilinear derivative convention at integer coordinates exactly
   (a pure hat derivative is 0 there, silently wrong), and the clamped
   `fx1` makes the derivative vanish at the right border like the
   reference's clamped corner gathers do.  d warped/dy swaps the y-hat
   for the same indicator difference along y.

2. **Lane-friendly layouts everywhere.**  The image block is passed as
   [B, H, C, W] (W on the 128-lane axis; a natural NHWC block would put
   C=3 on lanes, which Mosaic pads to 128 — a measured 42x VMEM blowup:
   the [1,192,640,3] f32 window alone wanted 62.9 MB x2 buffers).
   Coordinates travel as [B, H, W] and the output as [B, C, H, W], so
   no operand or result carries a 1- or 3-wide minor dim that XLA would
   pad 128x in HBM and re-copy.

Per grid step (b, one output row): indicators are built once; a dynamic
fori walks only the row band [floor(min y), floor(max y)+1] the tile's
epipolar segment touches (pose-independent, exact).

Semantics match ops/sampling.grid_sample(..., "border") and its
autodiff coordinate gradient (tests/test_warp_mxu.py, interpret mode;
on-device equivalence in the verify skill).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def resolve_warp_backend(backend):
    """'auto' -> 'mxu' on TPU, 'lax' elsewhere."""
    if backend == "auto":
        return "mxu" if jax.default_backend() == "tpu" else "lax"
    return backend


# dot_general dims: row [C, W] (x) indicators [W, TN], contract over W
_DN = (((1,), (0,)), ((), ()))


def _coords_prep(cx, cy, H, W):
    """Unnormalize (align_corners), border-clamp, split int/frac parts.

    cx, cy: [1, TN] normalized [-1, 1].  Mirrors ops/sampling.py:17-49.
    """
    x = (cx + 1.0) * 0.5 * (W - 1)
    y = (cy + 1.0) * 0.5 * (H - 1)
    xc = jnp.clip(x, 0.0, W - 1)
    yc = jnp.clip(y, 0.0, H - 1)
    fx = jnp.floor(xc)
    fy = jnp.floor(yc)
    return x, y, xc, yc, fx, fy


def _indicators(fx, W, TN, mm_dtype):
    """I0[xi,n] = (xi == fx[n]), I1[xi,n] = (xi == min(fx+1, W-1))."""
    xi = jax.lax.broadcasted_iota(jnp.int32, (W, TN), 0)
    fxi = fx.astype(jnp.int32)  # [1, TN]
    i0 = (xi == fxi).astype(mm_dtype)
    i1 = (xi == jnp.minimum(fxi + 1, W - 1)).astype(mm_dtype)
    return i0, i1


def _band(yc, H):
    """Dynamic row band [lo, hi) touched by this tile's y interpolation."""
    y_safe = jnp.where(jnp.isfinite(yc), yc, 0.0)
    lo = jnp.clip(jnp.floor(jnp.min(y_safe)), 0.0, H - 1).astype(jnp.int32)
    hi = jnp.minimum(
        jnp.clip(jnp.floor(jnp.max(y_safe)), 0.0, H - 1).astype(jnp.int32)
        + 2,
        H,
    )
    return lo, hi


def _fwd_kernel(H, W, CP, TN, WIN, precision, mm_dtype,
                img_ref, cx_ref, cy_ref, out_ref, acc_ref):
    _, _, xc, yc, fx, fy = _coords_prep(cx_ref[0, 0], cy_ref[0, 0], H, W)
    i0, i1 = _indicators(fx, W, TN, mm_dtype)
    f = (xc - fx)  # [1, TN] f32

    lo, hi = _band(yc, H)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    # WIN-row window per chunk: ONE matmul pair selects x-corners for all
    # WIN rows at once ([WIN*CP, W] @ [W, TN]); the y blend is then WIN
    # tile-aligned [CP, TN] FMAs (CP = 8-padded channels -> aligned
    # row-group merge and slices, no relayouts). Usually 1 chunk/tile.
    def chunk_body(kk, _):
        base0 = lo + kk * WIN
        base = jnp.minimum(base0, H - WIN)
        w2 = img_ref[0, pl.ds(base, WIN)].reshape(WIN * CP, W)
        a0 = jax.lax.dot_general(w2, i0, _DN,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)  # [WIN*CP, TN]
        a1 = jax.lax.dot_general(w2, i1, _DN,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
        for j in range(WIN):
            gyi = base + j
            # rows revisited by a clamped window start are masked out
            ok = ((gyi >= base0) & (gyi < hi)).astype(jnp.float32)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(yc - gyi)) * ok  # [1, TN]
            a0j = a0[j * CP:(j + 1) * CP]
            a1j = a1[j * CP:(j + 1) * CP]
            acc_ref[...] += wy * ((1.0 - f) * a0j + f * a1j)
        return 0

    nch = (hi - lo + WIN - 1) // WIN
    jax.lax.fori_loop(0, nch, chunk_body, 0)
    out_ref[0, 0] = acc_ref[...].astype(out_ref.dtype)


def _bwd_kernel(H, W, CP, TN, WIN, precision, mm_dtype,
                img_ref, cx_ref, cy_ref, g_ref,
                dcx_ref, dcy_ref, gx_ref, gy_ref):
    x, y, xc, yc, fx, fy = _coords_prep(cx_ref[0, 0], cy_ref[0, 0], H, W)
    i0, i1 = _indicators(fx, W, TN, mm_dtype)
    f = (xc - fx)

    fyi = fy.astype(jnp.int32)
    fy1 = jnp.minimum(fyi + 1, H - 1)

    lo, hi = _band(yc, H)
    gx_ref[...] = jnp.zeros_like(gx_ref)
    gy_ref[...] = jnp.zeros_like(gy_ref)

    g = g_ref[0, 0]  # [CP, TN] f32 (zero-padded channels)

    def chunk_body(kk, _):
        base0 = lo + kk * WIN
        base = jnp.minimum(base0, H - WIN)
        w2 = img_ref[0, pl.ds(base, WIN)].reshape(WIN * CP, W)
        a0 = jax.lax.dot_general(w2, i0, _DN,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
        a1 = jax.lax.dot_general(w2, i1, _DN,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
        for j in range(WIN):
            gyi = base + j
            ok = ((gyi >= base0) & (gyi < hi)).astype(jnp.float32)
            a0j = a0[j * CP:(j + 1) * CP]
            a1j = a1[j * CP:(j + 1) * CP]
            b = (1.0 - f) * a0j + f * a1j    # warped contribution of row
            ddx = a1j - a0j                   # d b / dx (one-sided at ints)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(yc - gyi)) * ok
            # d warped / dy: indicator difference along y (one-sided at
            # ints, vanishing at the clamped bottom border: fy1 == fy)
            dwy = ((gyi == fy1).astype(jnp.float32)
                   - (gyi == fyi).astype(jnp.float32)) * ok
            gx_ref[...] += jnp.sum(g * ddx, axis=0, keepdims=True) * wy
            gy_ref[...] += jnp.sum(g * b, axis=0, keepdims=True) * dwy
        return 0

    nch = (hi - lo + WIN - 1) // WIN
    jax.lax.fori_loop(0, nch, chunk_body, 0)

    # clamp masks (jnp.clip passes gradient only strictly inside) and the
    # align_corners unnormalization chain
    mx = ((x >= 0.0) & (x <= W - 1)).astype(jnp.float32)
    my = ((y >= 0.0) & (y <= H - 1)).astype(jnp.float32)
    dcx_ref[0, 0] = gx_ref[...] * mx * (0.5 * (W - 1))
    dcy_ref[0, 0] = gy_ref[...] * my * (0.5 * (H - 1))


def _call_fwd(img_t, cx, cy, rows, win, interpret, precision, mm_dtype):
    B, H, CP, W = img_t.shape
    NT, TN = H // rows, rows * W
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H, W, CP, TN, win,
                          jax.lax.Precision(precision), jnp.dtype(mm_dtype)),
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec((1, H, CP, W), lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TN), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TN), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, CP, TN), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NT, CP, TN), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CP, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(img_t, cx, cy)


def _call_bwd(img_t, cx, cy, g, rows, win, interpret, precision, mm_dtype):
    B, H, CP, W = img_t.shape
    NT, TN = H // rows, rows * W
    return pl.pallas_call(
        functools.partial(_bwd_kernel, H, W, CP, TN, win,
                          jax.lax.Precision(precision), jnp.dtype(mm_dtype)),
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec((1, H, CP, W), lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TN), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TN), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CP, TN), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, TN), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TN), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, NT, 1, TN), jnp.float32),
            jax.ShapeDtypeStruct((B, NT, 1, TN), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, TN), jnp.float32),
            pltpu.VMEM((1, TN), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(img_t, cx, cy, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _grid_sample_border_mxu_vjp(img, coords, interpret=False,
                                precision="default", mm_dtype="bfloat16"):
    out, _ = _fwd(img, coords, interpret, precision, mm_dtype)
    return out


def grid_sample_border_mxu(img, coords, interpret=False,
                           precision="default", mm_dtype="bfloat16"):
    """Drop-in for ops/sampling.grid_sample(img, coords, "border").

    img: [B, H, W, C] float32; coords: [B, H, W, 2] normalized [-1, 1]
    (align_corners=True).  Returns [B, H, W, C] float32.

    Differentiable wrt COORDS ONLY: the image operand is explicitly
    stop_gradient'ed here (every caller warps training data, which never
    needs an image gradient; the bwd kernel computes only dcoords). A
    future caller that must differentiate through the warped image (e.g.
    feature warping) needs a transpose-matmul bwd kernel first — use
    ops/sampling.grid_sample for that case.

    mm_dtype is the image MXU-operand dtype: "bfloat16" (default; exact
    pixel selection, image values rounded to ~8.7 bits — below the 8-bit
    source quantization) or "float32" with precision="highest" for the
    bit-exact mode used by the equivalence tests.
    """
    img = jax.lax.stop_gradient(img)
    return _grid_sample_border_mxu_vjp(img, coords, interpret, precision,
                                       mm_dtype)


def _rows_for(H):
    """Output rows per grid step: amortizes per-step fixed costs (indicator
    build, matmul dispatch) 4x; falls back for heights not divisible."""
    for r in (4, 2, 1):
        if H % r == 0:
            return r
    return 1


def _win_for(H):
    """Static window rows per band chunk (one matmul pair per chunk)."""
    return 16 if H >= 16 else H


def _img_padded(img, mm_dtype):
    """[B, H, W, C] -> [B, H, 8, W]: W on lanes, channels zero-padded to
    one full sublane group so WIN-row merges and [CP, TN] slices are
    tile-aligned (no Mosaic relayouts)."""
    B, H, W, C = img.shape
    img_t = jnp.transpose(img, (0, 1, 3, 2)).astype(jnp.dtype(mm_dtype))
    return jnp.pad(img_t, ((0, 0), (0, 0), (0, 8 - C), (0, 0)))


def _fwd(img, coords, interpret, precision, mm_dtype):
    B, H, W, C = img.shape
    rows = _rows_for(H)
    NT, TN = H // rows, rows * W
    cx = coords[..., 0].astype(jnp.float32).reshape(B, NT, 1, TN)
    cy = coords[..., 1].astype(jnp.float32).reshape(B, NT, 1, TN)
    img_t = _img_padded(img, mm_dtype)
    out = _call_fwd(img_t, cx, cy, rows, _win_for(H), interpret, precision,
                    mm_dtype)
    # [B, NT, 8, rows*W] -> [B, H, W, C]
    out = out[:, :, :C].reshape(B, NT, C, rows, W).transpose(0, 1, 3, 4, 2)
    # residuals: the primal image (aliases the live input; the padded
    # transposed copy is recomputed in _bwd — saving it would hold an
    # extra copy per warp)
    return out.reshape(B, H, W, C), (img, cx, cy)


def _bwd(interpret, precision, mm_dtype, res, g):
    img, cx, cy = res
    B, H, W, C = img.shape
    rows = _rows_for(H)
    NT, TN = H // rows, rows * W
    img_t = _img_padded(img, mm_dtype)
    g2 = g.astype(jnp.float32).reshape(B, NT, rows, W, C)
    g2 = g2.transpose(0, 1, 4, 2, 3).reshape(B, NT, C, TN)
    g2 = jnp.pad(g2, ((0, 0), (0, 0), (0, 8 - C), (0, 0)))
    dcx, dcy = _call_bwd(img_t, cx, cy, g2, rows, _win_for(H), interpret,
                         precision, mm_dtype)
    dcoords = jnp.stack([dcx.reshape(B, H, W), dcy.reshape(B, H, W)],
                        axis=-1)
    return jnp.zeros((B, H, W, C), jnp.float32), dcoords


_grid_sample_border_mxu_vjp.defvjp(
    lambda img, coords, interpret, precision, mm_dtype:
        _fwd(img, coords, interpret, precision, mm_dtype),
    _bwd,
)
