"""Large-kernel depthwise conv as per-channel BANDED MXU matmuls.

The lax depthwise lowering runs RepLKNet's big kernels at 3.6-6.8 TF/s
useful (the specialized XLA depthwise emitters; tools/probe_banded.py).
This kernel reformulates the 2D depthwise conv, per channel c, as

    Y[c, h, :] = sum_dy  X[c, h + dy - half, :] @ T[c, dy]

where T[c, dy] is the [W, W] banded (Toeplitz) matrix carrying kernel
row dy on its k diagonals — zero padding == truncated diagonals, so the
result is exactly the SAME-padded depthwise conv, just summed in a
different order. It spends W/k more raw FLOPs but runs them on the MXU
at dense-matmul rates, which on these shapes is measured faster than
XLA's depthwise emitters for stages 0-1 (W in {160, 80}); stages 2-3
(W <= 40: N-tile padding eats the advantage) stay on lax.

Layout choices (the whole game — see kernels/README.md):
  * X is pre-arranged H-MAJOR: [C, Hp*B, W] with flat row hp*B + b and
    Hp = H + k - 1 (zero rows absorb the SAME padding). Every dy-shift
    is then ONE contiguous sublane-offset slice of dy*B rows — no
    per-batch splits, no garbage rows, and for B % 8 == 0 the offset is
    sublane-aligned (no rotation).
  * T is [C, k*W, W] (dy-major rows): the per-dy rhs is a sublane
    slice [dy*W:(dy+1)*W] (W % 8 == 0, aligned).
  * One [H*B, W] @ [W, W] bf16 MXU dot per dy, f32 accumulation in a
    VMEM scratch (k-step static unroll; the round-1 Mosaic blowup was
    961-tap f32 loop CARRIES, not scratch accumulation).

Weights: T is a pure weight transform of the merged [k, k, 1, C]
kernel (build_T), precomputed ONCE at deploy reparam time — PPEA
freezes the backbone, so it never changes during training either.
Reference op: replknet.py:15-37 (the reference's CUDA implicit-GEMM
depthwise swap-in plays the same role on GPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stage_backends(backend: str):
    """Split --lk_deploy_backend into 4 per-encoder-stage tokens.

    'auto' gates by stage: banded wins stages 0-1 (1.37x / 2.4x at B=8
    640x192) and loses stages 2-3, where W <= 40 N-tile padding eats
    the MXU advantage (tools/probe_banded2.py) — so auto resolves to
    ('auto', 'auto', 'lax', 'lax') and the per-call resolve below
    decides platform/dtype. A comma list pins each stage explicitly."""
    if "," in backend:
        parts = backend.split(",")
        assert len(parts) == 4, backend
        return parts
    if backend == "auto":
        return ["auto", "auto", "lax", "lax"]
    return [backend] * 4


def resolve_lk_deploy_backend(token: str, merged: bool, dtype) -> str:
    """Per-call resolution of one stage token: 'auto' -> 'banded' only
    for merged-form bf16 inference on TPU (mirrors
    ffn_mxu.resolve_ffn_backend); an explicit 'banded' is honored
    everywhere (interpret mode off-TPU — test path)."""
    if token != "auto":
        return token
    if merged and jax.default_backend() == "tpu" and dtype == jnp.bfloat16:
        return "banded"
    return "lax"


def build_T(kernel, W):
    """Banded weight transform: [k, k, 1, C] HWIO -> [C, k*W, W].

    T[c, dy*W + wi, wo] = kernel[dy, wi - wo + half, 0, c] on the k
    diagonals |wi - wo| <= half, zero elsewhere (== zero-padding SAME).
    Pure jnp (usable inside jit for tests; deploy precomputes once).
    """
    k = kernel.shape[0]
    half = k // 2
    C = kernel.shape[-1]
    wi = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    wo = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    dx = wi - wo + half  # [W, W] in [0, k) on the band
    on_band = (dx >= 0) & (dx < k)
    dx_safe = jnp.clip(dx, 0, k - 1)
    # rows[dy]: [W, W, C] = kernel[dy, dx, :] masked to the band
    krows = kernel[:, :, 0, :]  # [k, k, C]
    t = krows[:, dx_safe, :] * on_band[None, :, :, None]  # [k, W, W, C]
    return jnp.transpose(t, (3, 0, 1, 2)).reshape(C, k * W, W)


def build_T_t(kernel, W):
    """Transposed banded weights [C, W_out, k*W_in]: no HBM lane padding
    when W % 128 != 0 (the [C, k*W, W] form pads W->ceil128 in HBM,
    1.6x extra weight streaming at W=160/80)."""
    k = kernel.shape[0]
    C = kernel.shape[-1]
    T = build_T(kernel, W)  # [C, k*W_in, W_out]
    return jnp.transpose(
        T.reshape(C, k, W, W), (0, 3, 1, 2)).reshape(C, W, k * W)


def _kernel(k, B, HB, W, n_acc, t_transposed, x_ref, t_ref, o_ref,
            *acc_refs):
    # n_acc interleaved accumulators break the dot->dot RAW dependency
    # chain so consecutive MXU dispatches can pipeline
    for a in acc_refs:
        a[...] = jnp.zeros_like(a)
    for dy in range(k):
        lhs = x_ref[0, dy * B: dy * B + HB, :]
        if t_transposed:
            # T stored [C, W_out, k*W_in] (no HBM lane padding for
            # W % 128 != 0): contract lhs lanes with rhs lanes
            rhs = t_ref[0, :, dy * W: (dy + 1) * W]
            d = jax.lax.dot_general(
                lhs, rhs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            rhs = t_ref[0, dy * W: (dy + 1) * W, :]
            d = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
        acc_refs[dy % n_acc][...] += d
    tot = acc_refs[0][...]
    for a in acc_refs[1:]:
        tot = tot + a[...]
    o_ref[0] = tot.astype(o_ref.dtype)


def _pallas(xh, T, k, B, H, out_dtype, interpret, n_acc=4):
    C, HpB, W = xh.shape
    HB = H * B
    t_transposed = T.shape[1] == W  # [C, W, k*W] vs [C, k*W, W]
    t_block = (1, W, k * W) if t_transposed else (1, k * W, W)
    return pl.pallas_call(
        functools.partial(_kernel, k, B, HB, W, n_acc, t_transposed),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, HpB, W), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(t_block, lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HB, W), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, HB, W), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((HB, W), jnp.float32) for _ in range(n_acc)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xh, T)


@functools.partial(jax.jit, static_argnames=("k", "interpret", "n_acc"))
def banded_depthwise(x, T, k, interpret=False, n_acc=4):
    """SAME-padded stride-1 depthwise conv of NHWC x with banded T.

    x: [B, H, W, C] (bf16 recommended); T: [C, k*W, W] from build_T.
    Requires B % 8 == 0 (sublane-aligned dy shifts) — callers fall back
    to lax otherwise. Returns [B, H, W, C] in x.dtype.
    """
    B, H, W, C = x.shape
    assert B % 8 == 0, B
    assert T.shape in ((C, k * W, W), (C, W, k * W)), (T.shape, C, k, W)
    half = k // 2
    xp = jnp.pad(x, ((0, 0), (half, half), (0, 0), (0, 0)))
    # H-major flat rows: [C, Hp*B, W], row = hp*B + b
    xh = jnp.transpose(xp, (3, 1, 0, 2)).reshape(C, (H + k - 1) * B, W)
    out = _pallas(xh.astype(T.dtype), T, k, B, H, x.dtype, interpret,
                  n_acc=n_acc)
    return jnp.transpose(out.reshape(C, H, B, W), (2, 1, 3, 0))
