"""torch-semantics BatchNorm.

`flax.linen.BatchNorm` updates the running variance with the BIASED
batch variance; `torch.nn.BatchNorm2d` (every norm in the reference —
replknet.py `conv_bn`, resnet, decoders) updates it with the UNBIASED
(Bessel-corrected, n/(n-1)) one while still normalizing with the biased
one in train mode. The divergence scales like 1/(n-1) per update: ~0.8%
steady-state on stage-3 features at 192x640 (n = B*6*20) and up to 10%
after one step at small test sizes — caught by the round-5 lockstep
trajectory oracle (tests/test_ref_trajectory.py::
test_lockstep_bn_running_stats).

This subclass reproduces flax's `BatchNorm.__call__` exactly (same
variable names "mean"/"var", params "scale"/"bias", same `_compute_stats`
/ `_normalize` helpers, so checkpoints, importers, and the compute path
are bit-identical) and applies the Bessel correction only to the
running-variance update.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import module as _fmodule
from flax.linen import normalization as _fnorm


class BatchNorm(nn.BatchNorm):
    """`nn.BatchNorm` with torch's unbiased running-variance update."""

    @nn.compact
    def __call__(self, x, use_running_average=None, *,
                 mask: jax.Array | None = None):
        use_running_average = _fmodule.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = _fnorm._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(
            i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(
                s,
                jnp.float32 if self.force_float32_reductions
                else self.param_dtype),
            feature_shape)
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(
                s,
                jnp.float32 if self.force_float32_reductions
                else self.param_dtype),
            feature_shape)

        if use_running_average:
            mean = (ra_mean.value if self.force_float32_reductions
                    else jnp.asarray(ra_mean.value, self.param_dtype))
            var = (ra_var.value if self.force_float32_reductions
                   else jnp.asarray(ra_var.value, self.param_dtype))
        else:
            mean, var = _fnorm._compute_stats(
                x, reduction_axes,
                dtype=self.dtype,
                axis_name=(self.axis_name if not self.is_initializing()
                           else None),
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                mask=mask,
                force_float32_reductions=self.force_float32_reductions)

            if not self.is_initializing():
                # torch-parity: running update uses the UNBIASED batch
                # variance var * n/(n-1) (the only deviation from flax).
                # Under GSPMD the jit-level shapes are global, so n is
                # the cross-device batch count (SyncBN semantics);
                # axis_name-based pmap reductions would need the axis
                # size folded in — unused here.
                assert self.axis_name is None, (
                    "torch BatchNorm subclass: axis_name reductions not "
                    "supported (use GSPMD-sharded jit)")
                n = int(np.prod([x.shape[i] for i in reduction_axes]))
                bessel = n / max(n - 1, 1)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var * bessel)

        return _fnorm._normalize(
            self, x, mean, var, reduction_axes, feature_axes,
            self.dtype, self.param_dtype, self.epsilon,
            self.use_bias, self.use_scale,
            self.bias_init, self.scale_init,
            self.force_float32_reductions)
