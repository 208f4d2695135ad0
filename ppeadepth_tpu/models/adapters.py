"""PEA adapters — the core PPEA-Depth contribution, channel-last.

In NHWC the reference's "flatten HW to tokens, Linear over channels" dance
(replknet_adapter.py:35-47) is just `nn.Dense` on the last axis — zero
reshapes, and XLA fuses the bottleneck GEMMs into the surrounding block.

Zero-init convention: every adapter's *last* projection (D_fc2) starts at
zero so a freshly-initialised adapter model is exactly the plain backbone
(replknet_adapter.py:482-508, depth_decoder_v2.py:31-39). Transition
adapters are deliberately NOT zero-initialised, matching the reference
(its init loop only matches modules named 'adapter'; `trans_adpt` misses).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .norm import BatchNorm as TorchBatchNorm  # torch-parity running_var


class ChannelAdapter(nn.Module):
    """Bottleneck MLP over channels: Dense(C->C*ratio) - GELU - Dense(->C).

    The ConvFFN `mlp_adapter` (replknet_adapter.py:20-47) and the
    transition adapter. mlp_ratio 0.25 (0.5 when adpt_test == 2).
    """

    features: int
    mlp_ratio: float = 0.25
    zero_init: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        hidden = int(self.features * self.mlp_ratio)
        x = nn.Dense(hidden, dtype=self.dtype, name="D_fc1")(x)
        x = nn.gelu(x, approximate=False)
        out_init = nn.initializers.zeros if self.zero_init else None
        kwargs = {"kernel_init": out_init} if out_init is not None else {}
        x = nn.Dense(self.features, dtype=self.dtype, name="D_fc2", **kwargs)(x)
        return x


class BAdapter(nn.Module):
    """Block adapter with `adpt_test`-routed variants
    (replknet_adapter.py:49-109):
      1/2: Dense - GELU - Dense
      4:   Conv3x3(C -> C*ratio) - GELU - Dense(-> C)   [shipped config]
      else: Conv3x3 - GELU - Conv3x3
    D_fc2 zero-initialised in all variants.
    """

    features: int
    adpt_test: int = 4
    mlp_ratio: float = 0.25
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        hidden = int(self.features * self.mlp_ratio)
        zeros = nn.initializers.zeros
        dt = self.dtype
        if self.adpt_test in (1, 2):
            x = nn.Dense(hidden, dtype=dt, name="D_fc1")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.features, dtype=dt, name="D_fc2",
                         kernel_init=zeros)(x)
        elif self.adpt_test == 4:
            x = nn.Conv(hidden, (3, 3), padding=1, dtype=dt, name="D_fc1")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.features, dtype=dt, name="D_fc2",
                         kernel_init=zeros)(x)
        else:
            x = nn.Conv(hidden, (3, 3), padding=1, dtype=dt, name="D_fc1")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Conv(
                self.features, (3, 3), padding=1, dtype=dt, name="D_fc2",
                kernel_init=zeros,
            )(x)
        return x


class InputAdapter(nn.Module):
    """Strided conv stem adapter (replknet_adapter.py:134-149).
    Not zero-initialised in the reference either ('input_adapter' name does
    not start a 'D_fc2'-under-'adapter' match... it does contain 'adapter',
    so its D_fc2 conv IS zero-init there — mirrored here)."""

    features: int
    mlp_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.mlp_ratio)
        x = nn.Conv(hidden, (3, 3), strides=(2, 2), padding=1, name="D_fc1")(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            self.features, (3, 3), padding=1, name="D_fc2",
            kernel_init=nn.initializers.zeros,
        )(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(x)
        return x


class DecoderAdapter(nn.Module):
    """Decoder adapter with differing in/out widths
    (depth_decoder_v2.py:19-55): hidden = (in + out)/2 * ratio, Dense
    bottleneck, D_fc2 zero-init.
    """

    features_out: int
    mlp_ratio: float = 0.25

    @nn.compact
    def __call__(self, x):
        features_in = x.shape[-1]
        hidden = int((features_in + self.features_out) / 2 * self.mlp_ratio)
        x = nn.Dense(hidden, name="D_fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(
            self.features_out, name="D_fc2",
            kernel_init=nn.initializers.zeros,
        )(x)
        return x


class UpAdapter(nn.Module):
    """dec_id==10 per-level adapter (depth_decoder_v2.py:56-79):
    Dense(in->out) zero-init, GELU, nearest 2x upsample."""

    features_out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.features_out, name="D_fc1",
            kernel_init=nn.initializers.zeros,
        )(x)
        x = nn.gelu(x, approximate=False)
        B, H, W, C = x.shape
        x = jnp.broadcast_to(
            x[:, :, None, :, None, :], (B, H, 2, W, 2, C)
        ).reshape(B, 2 * H, 2 * W, C)
        return x
