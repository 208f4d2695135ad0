"""Model-level structural reparam: merged deploy model == training model
in eval mode (the replknet.py:400-412 check at full-model scale)."""

import jax
import jax.numpy as jnp
import numpy as np

from ppeadepth_tpu.ckpt.deploy import structural_reparam
from ppeadepth_tpu.models.replknet import RepLKNet

RNGS = {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)}


def test_full_model_reparam_equivalence(rng):
    x = jnp.asarray(rng.rand(2, 32, 48, 3).astype(np.float32))
    model = RepLKNet(rep_size="t", adpt_test=4)
    vars_ = model.init(RNGS, x, False)
    # randomise BN statistics (mean/var) so the fold matters, keep weights
    # at init so activations stay in a numerically comparable range
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.rand(*a.shape).astype(np.float32) * 0.4 + 0.8
        ),
        vars_["batch_stats"],
    )
    vars_ = {"params": vars_["params"], "batch_stats": stats}
    y_train_form = model.apply(vars_, x, False)

    mp, ms = structural_reparam(vars_["params"], vars_["batch_stats"])
    merged = RepLKNet(rep_size="t", adpt_test=4, merged=True)
    y_deploy = merged.apply({"params": mp, "batch_stats": ms}, x, False)

    for a, b in zip(y_train_form, y_deploy):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3
        )

    # the merged tree actually dropped the branches
    import flax
    flat = flax.traverse_util.flatten_dict(mp)
    names = {"/".join(k) for k in flat}
    assert not any("lkb_origin" in n or "small_conv" in n for n in names)
    assert any("lkb_reparam" in n for n in names)
