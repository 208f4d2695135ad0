"""Pose decoder (pose_decoder.py:12-52) and the PoseCNN variant
(pose_cnn.py:10-47; NOTE the reference's --pose_cnn path crashes —
repdepth.py:538 calls an undefined predict_poses_vit — so PoseCNN is
provided for checkpoint parity but the composition only wires the
ResNet+PoseDecoder path, same as the live reference)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class PoseDecoder(nn.Module):
    num_ch_enc: Sequence[int]
    num_input_features: int = 1
    num_frames_to_predict_for: int = 2

    @nn.compact
    def __call__(self, input_features):
        """input_features: list (len num_input_features) of feature
        pyramids; only the last level of each is used.
        Returns (axisangle, translation): [B, num_frames, 1, 3]."""
        last = [f[-1] for f in input_features]
        cat = jnp.concatenate(
            [nn.relu(nn.Conv(256, (1, 1), name=f"squeeze_{i}" if i else "squeeze")(f))
             for i, f in enumerate(last)],
            axis=-1,
        )
        out = cat
        out = nn.relu(nn.Conv(256, (3, 3), padding=1, name="pose_0")(out))
        out = nn.relu(nn.Conv(256, (3, 3), padding=1, name="pose_1")(out))
        out = nn.Conv(
            6 * self.num_frames_to_predict_for, (1, 1), name="pose_2"
        )(out)
        out = out.mean(axis=(1, 2))  # global average over H, W
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:]


class PoseCNN(nn.Module):
    num_input_frames: int = 3

    @nn.compact
    def __call__(self, x):
        widths = [16, 32, 64, 128, 256, 256, 256]
        strides = [2, 2, 2, 2, 2, 1, 1]
        kernels = [7, 5, 3, 3, 3, 3, 3]
        for i, (w, s, k) in enumerate(zip(widths, strides, kernels)):
            x = nn.Conv(
                w, (k, k), strides=(s, s), padding=k // 2, name=f"conv_{i}"
            )(x)
            x = nn.relu(x)
        x = nn.Conv(
            6 * (self.num_input_frames - 1), (1, 1), name="pose_conv"
        )(x)
        x = x.mean(axis=(1, 2))
        x = 0.01 * x.reshape(-1, self.num_input_frames - 1, 1, 6)
        return x[..., :3], x[..., 3:]
