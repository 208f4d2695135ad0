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


def build_T_t_mm(kernel, W, dtype=None):
    """Gather-free build_T_t for PER-STEP in-jit use (training path).

    build_T_t's krows[:, dx, :] advanced-index lowers to a TPU gather
    (~140 GB/s effective — ~3 ms for the 406 MB stage-0 table, slower
    than the conv it feeds). This form contracts the kernel against the
    0/1 diagonal-indicator constant D[j, o, i] = (i - o + half == j)
    with ONE matmul (6.3 GFLOP at stage 0, ~0.1 ms): exactly one j
    matches per (o, i), so the result equals the gather build exactly
    even at bf16 — each output entry is a single product by 1.0.
    Casting BEFORE the dots keeps the per-dy [C, W_o, W_i] intermediates
    at the target width. Returns the transposed layout [C, W_out, k*W_in].

    Layout note (round 3, measured via the step HLO): a single dot
    producing [k, C, W, W] followed by a transpose to [C, W, k*W] makes
    XLA materialize the table TWICE (~12 ms/step of pure relayout
    copies at stage-0/1 train shapes). Instead, one small dot PER dy
    emits [C, W_o, W_i] directly and concatenate(axis=-1) lands each in
    its [.., dy*W_i:(dy+1)*W_i] slot of the standard-layout output in
    ONE materialization; no transpose exists in the lowering.
    (Round 5: the earlier stack(axis=2)+reshape spelling of the same
    values materialized BOTH the stacked [C, W, k, W] form and the
    reshaped [C, W, k*W] form — 13.5 ms/step of copies in the round-4
    attribution; the direct concatenate removes the extra copy.)
    """
    k = kernel.shape[0]
    half = k // 2
    C = kernel.shape[-1]
    if dtype is not None:
        kernel = kernel.astype(dtype)
    wo = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    wi = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    d_oi = (wi - wo + half)[None, :, :] == jnp.arange(k)[:, None, None]
    D = d_oi.astype(kernel.dtype)  # [k(j), W_o, W_i]
    krows = kernel[:, :, 0, :]  # [k(dy), k(j), C]
    parts = [
        jax.lax.dot_general(  # [C, W_o, W_i]
            krows[dy], D, (((0,), (0,)), ((), ())),
            preferred_element_type=kernel.dtype)
        for dy in range(k)
    ]
    return jnp.concatenate(parts, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def banded_depthwise_train(x, w, k, interpret=False, mm_dtype=jnp.bfloat16):
    """Differentiable banded depthwise conv for the TRAINING path.

    x: [B, H, W, C] NHWC; w: [k, k, 1, C] HWIO depthwise weight (the
    frozen backbone conv param — tables are rebuilt from it per step,
    ~0.3 ms of matmul+HBM at stage 0, so no persistent table memory).
    Gradients: d/dx is the flipped-kernel banded conv (same kernel,
    flipped tables); d/dw is the exact lax weight-grad pullback — under
    PPEA's frozen backbone it is dead code XLA eliminates, and when the
    conv DOES train it stays correct (unlike warp_mxu's zeros-cotangent
    image operand). Reference op: replknet.py:15-37.
    """
    W = x.shape[2]
    Tt = build_T_t_mm(w, W, mm_dtype)
    return banded_depthwise(x, Tt, k, interpret=interpret)


def _train_fwd(x, w, k, interpret, mm_dtype):
    return banded_depthwise_train(x, w, k, interpret, mm_dtype), (x, w)


def _train_bwd(k, interpret, mm_dtype, res, g):
    x, w = res
    W = x.shape[2]
    # correlation transpose == conv with the spatially flipped kernel
    Tbt = build_T_t_mm(w[::-1, ::-1], W, mm_dtype)
    dx = banded_depthwise(g, Tbt, k, interpret=interpret).astype(x.dtype)
    # exact weight grad via the lax pullback (frozen backbone -> DCE'd)
    from .lk_conv import _depthwise_lax

    _, pull = jax.vjp(
        lambda w_: _depthwise_lax(x, w_.astype(x.dtype), 1, k // 2), w)
    (dw,) = pull(g.astype(x.dtype))
    return dx, dw


banded_depthwise_train.defvjp(_train_fwd, _train_bwd)


def resolve_lk_train_backend(token: str, dtype) -> str:
    """Per-stage resolution for the TRAINING banded backend: 'auto'
    enables it only for bf16 compute on TPU (same dtype gate as the
    cost-volume/warp kernels); explicit 'banded' is honored everywhere
    (interpret mode off-TPU — test path)."""
    if token != "auto":
        return token
    if jax.default_backend() == "tpu" and dtype == jnp.bfloat16:
        return "banded"
    return "lax"


def _acc_classes(k, B):
    """Sublane residues of the dy row shifts, and accumulators per
    class: the dy*B slice offsets fall in {0..7}; each non-zero residue
    class accumulates from an ALIGNED slice `off` rows early into its
    own accumulator, read back shifted (+off rows) once at the end —
    one static-offset VMEM relayout per class per grid step instead of
    one per dy. With a single class (B % 8 == 0) the accumulators are
    interleaved purely to break the dot->dot RAW dependency chain
    (measured: n_acc=4 beats 2 by ~7% on stage 1)."""
    classes = sorted({(dy * B) % 8 for dy in range(k)})
    n_per = 4 if len(classes) == 1 else (2 if len(classes) == 2 else 1)
    return classes, n_per


def _kernel(k, B, HB, W, t_transposed, x_ref, t_ref, o_ref, *acc_refs):
    classes, n_per = _acc_classes(k, B)
    accs = {
        o: list(acc_refs[i * n_per: (i + 1) * n_per])
        for i, o in enumerate(classes)
    }
    for a in acc_refs:
        a[...] = jnp.zeros_like(a)
    counts = {o: 0 for o in classes}
    for dy in range(k):
        off = (dy * B) % 8
        rows = HB + 8 if off else HB
        lhs = x_ref[0, dy * B - off: dy * B - off + rows, :]
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
        pool = accs[off]
        pool[counts[off] % len(pool)][...] += d
        counts[off] += 1
    tot = None
    for o in classes:
        s = accs[o][0][...]
        for a in accs[o][1:]:
            s = s + a[...]
        # for off != 0, d[q] holds X[dy*B - off + q] @ T_dy: the
        # contribution to output row r sits at q = r + off
        part = s if o == 0 else s[o: o + HB, :]
        tot = part if tot is None else tot + part
    o_ref[0] = tot.astype(o_ref.dtype)


def _pallas(xh, T, k, B, H, out_dtype, interpret):
    C, HpB8, W = xh.shape
    HB = H * B
    classes, n_per = _acc_classes(k, B)
    t_transposed = T.shape[1] == W  # [C, W, k*W] vs [C, k*W, W]
    t_block = (1, W, k * W) if t_transposed else (1, k * W, W)
    scratch = []
    for o in classes:
        rows = HB if o == 0 else HB + 8
        scratch += [pltpu.VMEM((rows, W), jnp.float32)
                    for _ in range(n_per)]
    return pl.pallas_call(
        functools.partial(_kernel, k, B, HB, W, t_transposed),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, HpB8, W), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(t_block, lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HB, W), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, HB, W), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xh, T)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def banded_depthwise(x, T, k, interpret=False):
    """SAME-padded stride-1 depthwise conv of NHWC x with banded T.

    x: [B, H, W, C] (bf16 recommended); T: [C, k*W, W] from build_T or
    [C, W, k*W] from build_T_t. Any batch size: dy row shifts at
    non-zero sublane residues accumulate from an aligned slice into a
    per-residue accumulator read back shifted at the end (one relayout
    per residue class per grid step; B % 8 == 0 has a single class and
    zero relayouts). Returns [B, H, W, C] in x.dtype.
    """
    B, H, W, C = x.shape
    assert T.shape in ((C, k * W, W), (C, W, k * W)), (T.shape, C, k, W)
    half = k // 2
    xp = jnp.pad(x, ((0, 0), (half, half), (0, 0), (0, 0)))
    # H-major flat rows: [C, Hp*B, W], row = hp*B + b; 8 zero rows
    # appended so the off-residue slices (length HB+8) never run off
    # the end (max end = HpB + 8 - off)
    tail = 8 if any((dy * B) % 8 for dy in range(k)) else 0
    xh = jnp.transpose(xp, (3, 1, 0, 2)).reshape(C, (H + k - 1) * B, W)
    if tail:
        xh = jnp.pad(xh, ((0, 0), (0, tail), (0, 0)))
    out = _pallas(xh.astype(T.dtype), T, k, B, H, x.dtype, interpret)
    return jnp.transpose(out.reshape(C, H, B, W), (2, 1, 3, 0))
