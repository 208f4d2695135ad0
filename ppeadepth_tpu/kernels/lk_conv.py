"""Large-kernel depthwise 2D convolution — the one true kernel of RepLKNet.

The reference optionally swaps in a CUDA implicit-GEMM depthwise conv
(replknet.py:20-37, env-gated `LARGE_KERNEL_CONV_IMPL`); everywhere else it
is a plain `nn.Conv2d(groups=C)`. Here the op has a single entry point with
two backends:

  * `lax`   — `lax.conv_general_dilated` with `feature_group_count=C`
              (XLA already lowers depthwise convs well on TPU); and
  * `pallas`— a hand-tiled Mosaic kernel (kernels/lk_conv_pallas.py) that
              keeps a (H-tile + halo, W, C-lane) window in VMEM and
              accumulates the k x k taps as shifted multiply-adds on the
              VPU.

Backend selection: `set_backend("pallas"|"lax")` or env
`PPEA_LK_BACKEND`. The pallas path is only used on TPU for stride-1
kernels; everything else falls back to lax.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_BACKEND = os.environ.get("PPEA_LK_BACKEND", "lax")


def set_backend(name: str):
    global _BACKEND
    assert name in ("lax", "pallas"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def depthwise_conv2d(x, w, stride: int = 1, padding: int | None = None):
    """Depthwise conv over NHWC input.

    x: [B, H, W, C]; w: [kh, kw, 1, C] (HWIO with feature_group_count=C).
    padding defaults to k//2 ('same' for odd k, matching the reference).
    """
    k = w.shape[0]
    if padding is None:
        padding = k // 2
    if (
        _BACKEND == "pallas"
        and stride == 1
        and x.ndim == 4
        and jax.default_backend() == "tpu"
    ):
        from . import lk_conv_pallas

        return lk_conv_pallas.depthwise_conv2d_pallas(x, w, padding)
    return _depthwise_lax(x, w, stride, padding)


def _depthwise_lax(x, w, stride, padding):
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def fuse_conv_bn(kernel, gamma, beta, mean, var, eps=1e-5):
    """Fold BN statistics into conv weights: returns (kernel', bias').

    kernel: [kh, kw, I, O] (HWIO). Matches replknet.py:68-77.
    """
    std = jnp.sqrt(var + eps)
    t = gamma / std  # [O]
    return kernel * t[None, None, None, :], beta - mean * gamma / std


def merge_reparam_kernels(
    lk_kernel, lk_bn, small_kernel, small_bn, eps=1e-5
):
    """Merge the parallel (large, small) depthwise conv+BN branches into one
    biased large-kernel conv. BNs are dicts {scale, bias, mean, var}.
    Matches ReparamLargeKernelConv.get_equivalent_kernel_bias
    (replknet.py:110-117): BN-fold both, pad the small kernel to the large
    size and add.
    """
    eq_k, eq_b = fuse_conv_bn(
        lk_kernel, lk_bn["scale"], lk_bn["bias"], lk_bn["mean"], lk_bn["var"], eps
    )
    if small_kernel is not None:
        s_k, s_b = fuse_conv_bn(
            small_kernel,
            small_bn["scale"],
            small_bn["bias"],
            small_bn["mean"],
            small_bn["var"],
            eps,
        )
        pad = (lk_kernel.shape[0] - small_kernel.shape[0]) // 2
        eq_k = eq_k + jnp.pad(s_k, ((pad, pad), (pad, pad), (0, 0), (0, 0)))
        eq_b = eq_b + s_b
    return eq_k, eq_b
