"""Fused ConvFFN inference kernel (MXU, deploy form).

Round-3 profiling of the merged teacher forward (BENCHMARKS.md): XLA
compiles each ConvFFN (preffn_bn -> 1x1 C->4C -> GELU -> 1x1 4C->C ->
residual [+ g_ffn * ChannelAdapter], models/replknet.py:142-173;
reference replknet_adapter.py:264-289) into one kOutput fusion that runs
at ~29 TF/s on a v5e — 7% of the bf16 MXU peak for what is two dense
matmuls. The standalone probe (tools/probe_ffn.py) measured the same
math at 4.5x via pallas. This kernel is that probe productionized:

  - every BN is an affine at inference -> folded into the matmul
    weights/biases OUTSIDE the kernel (f32), so the kernel is:
        h  = tanh_gelu(x @ W1f + b1f) @ W2f + b2f          (FFN)
        a  = tanh_gelu(x @ A1f + a1f) @ A2f + a2f          (adapter)
        out = x + h + a
  - weights live in VMEM across the whole grid (constant index_map);
    the 4C intermediate never touches HBM;
  - bf16 MXU operands with f32 accumulation (deploy dtype);
  - GELU: Mosaic lowers neither erfc nor erf, so the kernel uses
    tanh-GELU; its deviation from the exact erf form (~3e-3 absolute at
    |x|~2) is below the bf16 quantization of the intermediate. Measured
    end-to-end (tools/probe_ffn.py): 3.5e-3 relative on the block
    output.

INFERENCE ONLY (no VJP): training keeps the lax path, where XLA's
fusion decisions interact with the backward pass. Used when
`merged=True` (deploy form) on TPU with bf16 inputs — the bench.py /
serve.py configuration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def resolve_ffn_backend(backend: str, merged: bool, dtype) -> str:
    """'auto' -> 'mxu' only for the merged deploy form on TPU with bf16
    activations; everything else stays on the exact lax path."""
    if backend == "auto":
        ok = (
            merged
            and jax.default_backend() == "tpu"
            and dtype == jnp.bfloat16
        )
        return "mxu" if ok else "lax"
    return backend


def backend_for_config(backend: str, rep_size: str,
                       lk_deploy_backend: str = "auto") -> str:
    """XL 'auto' policy vs the stage-0 layout-poisoning target
    (measured close-outs, rounds 2-3).

    On XL (dw_ratio 1.5, 384-ch stage-0 depthwise), the Mosaic layout
    the FFN custom-call pins on its result propagates through XLA
    layout assignment into ONE downstream 27x27 depthwise conv instance
    (stage0/blocks_2), which then lowers via the
    `EmitDepthwiseInputBatchInSublanes` emitter at 507 ms — 6.4x the
    whole forward (B=8 @ 640x192: 586 ms with the kernel vs 91.3 ms
    without; the same conv takes 10 ms under the standard layout).

    The poisoned instance only exists while that conv is lowered BY
    XLA. The FFN kernel activates only under merged+TPU+bf16
    (resolve_ffn_backend) — exactly the condition under which the
    banded LK backend (round 3) takes stage 0 off XLA entirely
    (resolve_lk_deploy_backend), so with lk 'auto'/'banded' there is
    nothing left to poison: XL deploy with the FFN kernel in ALL
    stages + banded LK measures 76.1 ms vs 77.7 with the old stage-0
    workaround (tools/probe_xl.py --size xl --ffn_backend mxu). Only
    when stage-0 LK is pinned to 'lax' does 'auto' still resolve to
    'lax,auto,auto,auto' (89.9 ms vs 91.3 all-lax). B/L keep the
    kernel everywhere: measured 27.6 / 44.2 ms with banded. An
    explicit `--ffn_backend mxu` always forces the kernel.
    """
    if backend == "auto" and rep_size == "xl":
        from .banded_conv import stage_backends
        if stage_backends(lk_deploy_backend)[0] == "lax":
            return "lax,auto,auto,auto"
    return backend


def _tanh_gelu(x):
    return 0.5 * x * (1.0 + jnp.tanh(
        0.7978845608028654 * (x + 0.044715 * x * x * x)))


def _kernel_ffn(has_adapter, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                a1_ref, ab1_ref, a2_ref, ab2_ref, o_ref):
    x = x_ref[...]  # [TM, C] bf16
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = _tanh_gelu(h + b1_ref[...])
    y = jax.lax.dot_general(
        h.astype(jnp.bfloat16), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + b2_ref[...]
    if has_adapter:
        ah = jax.lax.dot_general(
            x, a1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ah = _tanh_gelu(ah + ab1_ref[...])
        ay = jax.lax.dot_general(
            ah.astype(jnp.bfloat16), a2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y + ay + ab2_ref[...]
    o_ref[...] = (x.astype(jnp.float32) + y).astype(jnp.bfloat16)


def _tile_m(M: int) -> int:
    """Largest multiple-of-8 divisor of M that is <= 512."""
    for tm in range(min(512, M), 7, -8):
        if M % tm == 0:
            return tm
    return M  # tiny M: single tile


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ffn_call(x2d, w1, b1, w2, b2, a1, ab1, a2, ab2, interpret=False):
    M, C = x2d.shape
    H4 = w1.shape[1]
    CA = a1.shape[1]
    TM = _tile_m(M)
    has_adapter = CA > 1
    const = lambda m: (0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_kernel_ffn, has_adapter),
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, C), lambda m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H4, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, CA), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CA), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((CA, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, C), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2d, w1, b1, w2, b2, a1, ab1, a2, ab2)


def fold_ffn_params(params, stats, g_ffn: float = 1.0, eps: float = 1e-5):
    """Fold preffn_bn + pw1/pw2 ConvBN + adapter Dense into kernel
    operands (f32 math, bf16 matmul weights).

    params/stats: the ConvFFN submodule's own collections
    (preffn_bn, pw1{conv,bn}, pw2{conv,bn}[, mlp_adapter{D_fc1,D_fc2}]).
    """
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731

    def bn_affine(pbn, sbn):
        s = f32(pbn["scale"]) * jax.lax.rsqrt(f32(sbn["var"]) + eps)
        t = f32(pbn["bias"]) - f32(sbn["mean"]) * s
        return s, t

    s0, t0 = bn_affine(params["preffn_bn"], stats["preffn_bn"])
    W1 = f32(params["pw1"]["conv"]["kernel"])[0, 0]  # [C, 4C]
    s1, t1 = bn_affine(params["pw1"]["bn"], stats["pw1"]["bn"])
    W1s = W1 * s1[None, :]
    W1f = W1s * s0[:, None]
    b1f = t0 @ W1s + t1  # [4C]
    W2 = f32(params["pw2"]["conv"]["kernel"])[0, 0]  # [4C, C]
    s2, t2 = bn_affine(params["pw2"]["bn"], stats["pw2"]["bn"])
    W2f = W2 * s2[None, :]
    b2f = t2

    if "mlp_adapter" in params:
        A1 = f32(params["mlp_adapter"]["D_fc1"]["kernel"])  # [C, CA]
        a1b = f32(params["mlp_adapter"]["D_fc1"]["bias"])
        A2 = f32(params["mlp_adapter"]["D_fc2"]["kernel"])  # [CA, C]
        a2b = f32(params["mlp_adapter"]["D_fc2"]["bias"])
        A1f = A1 * s0[:, None]
        a1f = t0 @ A1 + a1b
        A2f = A2 * g_ffn
        a2f = a2b * g_ffn
    else:
        C = W1.shape[0]
        A1f = jnp.zeros((C, 1), jnp.float32)
        a1f = jnp.zeros((1,), jnp.float32)
        A2f = jnp.zeros((1, C), jnp.float32)
        a2f = jnp.zeros((C,), jnp.float32)

    bf = jnp.bfloat16
    return (W1f.astype(bf), b1f[None, :], W2f.astype(bf), b2f[None, :],
            A1f.astype(bf), a1f[None, :], A2f.astype(bf), a2f[None, :])


def ffn_block_apply(x, folded, interpret: bool = False):
    """x: [B, H, W, C] bf16 -> residual ConvFFN output, same shape."""
    B, H, W, C = x.shape
    x2d = x.astype(jnp.bfloat16).reshape(B * H * W, C)
    out = _ffn_call(x2d, *folded, interpret=interpret)
    return out.reshape(B, H, W, C)
