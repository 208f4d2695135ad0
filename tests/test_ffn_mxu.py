"""Fused ConvFFN deploy kernel (kernels/ffn_mxu.py) vs the exact lax
path, interpret mode. The kernel folds preffn_bn + pw1/pw2 ConvBN + the
mlp_adapter into two matmul pairs; tolerance covers its two intended
deviations (bf16 MXU operands; tanh-GELU where lax uses erf-GELU —
see the kernel docstring; both below bf16 quantization in practice)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppeadepth_tpu.models.replknet import ConvFFN

C, H4, B, H, W = 16, 64, 2, 8, 24


def _build(ffn_backend, adpt_test, rng):
    model = ConvFFN(C, H4, 0.0, adpt_test=adpt_test, g_ffn=0.7,
                    merged=True, ffn_backend=ffn_backend,
                    dtype=jnp.bfloat16)
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "droppath": jax.random.PRNGKey(1)}, x)
    # randomize the zero-init adapter out-proj and BN stats so folding
    # bugs can't hide behind zeros / identity stats
    def perturb(tree, path=()):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                out[k] = perturb(v, p)
            elif k in ("mean",):
                out[k] = jnp.asarray(
                    rng.randn(*v.shape).astype(np.float32) * 0.05)
            elif k in ("var",):
                out[k] = jnp.asarray(
                    rng.rand(*v.shape).astype(np.float32) * 0.4 + 0.8)
            elif "D_fc2" in p and k == "kernel":
                out[k] = jnp.asarray(
                    rng.randn(*v.shape).astype(np.float32) * 0.05)
            else:
                out[k] = v
        return out

    variables = {k: perturb(v) for k, v in variables.items()}
    return model, variables, x


@pytest.mark.parametrize("adpt_test", [4, -1])
def test_ffn_mxu_matches_lax(rng, adpt_test):
    model_ref, variables, x = _build("lax", adpt_test, rng)
    y_ref = model_ref.apply(variables, x, False)

    model_mxu = ConvFFN(C, H4, 0.0, adpt_test=adpt_test, g_ffn=0.7,
                        merged=True, ffn_backend="mxu",
                        dtype=jnp.bfloat16)
    y_mxu = model_mxu.apply(variables, x, False)

    a = np.asarray(y_ref, np.float64)
    b = np.asarray(y_mxu, np.float64)
    scale = np.abs(a).max()
    assert np.abs(a - b).max() / scale < 2.5e-2, (
        f"max rel {np.abs(a - b).max() / scale:.3e}")
    # and it is genuinely close on average (catches structural errors
    # that still land within the loose per-element tolerance)
    assert np.abs(a - b).mean() / scale < 3e-3


def test_per_stage_ffn_backend_list(rng):
    """RepLKNet accepts a per-stage comma list (the XL layout-poisoning
    workaround): 'lax,mxu,mxu,mxu' must route stage 0 through the exact
    lax path and stages 1-3 through the kernel — output within kernel
    tolerance of all-lax, and an all-lax list is bit-identical to 'lax'."""
    from ppeadepth_tpu.models.replknet import RepLKNet

    def build(backend):
        model = RepLKNet(rep_size="t", merged=True, drop_path_rate=0.0,
                         ffn_backend=backend, dtype=jnp.bfloat16)
        return model

    x = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))
    variables = build("lax").init(
        {"params": jax.random.PRNGKey(0),
         "droppath": jax.random.PRNGKey(1)}, x)
    y_lax = build("lax").apply(variables, x, False)
    y_list_lax = build("lax,lax,lax,lax").apply(variables, x, False)
    y_mixed = build("lax,mxu,mxu,mxu").apply(variables, x, False)

    for a, b in zip(jax.tree_util.tree_leaves(y_lax),
                    jax.tree_util.tree_leaves(y_list_lax)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(y_lax),
                    jax.tree_util.tree_leaves(y_mixed)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 5e-2


def test_backend_for_config_xl_per_stage():
    """XL 'auto' keeps the kernel everywhere when stage-0 LK is banded
    (the banded kernel removes the poisoned conv; 76.1 vs 77.7 ms
    measured) and falls back to the per-stage stage-0-lax list only
    when the LK backend pins stage 0 to lax (89.9 vs 91.3 ms all-lax,
    BENCHMARKS.md)."""
    from ppeadepth_tpu.kernels.ffn_mxu import backend_for_config
    from ppeadepth_tpu.options import Config

    # default lk 'auto' -> stage-0 banded in deploy -> no workaround
    assert backend_for_config("auto", "xl") == "auto"
    assert backend_for_config("auto", "xl", "banded") == "auto"
    # stage-0 LK pinned to lax -> poisoned conv exists -> workaround
    assert backend_for_config("auto", "xl", "lax") == "lax,auto,auto,auto"
    assert backend_for_config(
        "auto", "xl", "lax,banded,lax,lax") == "lax,auto,auto,auto"
    assert backend_for_config("auto", "b", "lax") == "auto"
    assert backend_for_config("mxu", "xl", "lax") == "mxu"  # explicit wins
    assert backend_for_config(
        "lax,mxu,mxu,mxu", "xl") == "lax,mxu,mxu,mxu"
    # the resolved list must pass Config validation
    Config(ffn_backend=backend_for_config("auto", "xl", "lax"))


def test_ffn_auto_stays_lax_off_tpu(rng):
    """'auto' must not switch to the kernel on CPU / non-merged /
    non-bf16 configs."""
    from ppeadepth_tpu.kernels.ffn_mxu import resolve_ffn_backend

    assert resolve_ffn_backend("auto", True, jnp.bfloat16) == "lax"  # cpu
    assert resolve_ffn_backend("auto", False, jnp.bfloat16) == "lax"
    assert resolve_ffn_backend("auto", True, jnp.float32) == "lax"
    assert resolve_ffn_backend("lax", True, jnp.bfloat16) == "lax"
    assert resolve_ffn_backend("mxu", False, None) == "mxu"  # explicit
