"""Orbax checkpoint backend round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")

from ppeadepth_tpu.ckpt import orbax_io
from ppeadepth_tpu.models import RepDepth
from ppeadepth_tpu.options import Config
from ppeadepth_tpu.train import schedule
from ppeadepth_tpu.train.step import create_train_state


def test_orbax_roundtrip(tmp_path):
    from tests.test_train_step import make_batch

    opt = Config(adapter=True, rep_size="t", use_checkpoint=False,
                 height=64, width=96, num_depth_bins=8, bin_chunk=4)
    model = RepDepth(opt)
    batch = make_batch(opt, 2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1),
         "aug": jax.random.PRNGKey(2)},
        batch, 0.1, 10.0, False,
    )
    tx = schedule.make_optimizer(1e-4, 100)
    state = create_train_state(model, variables, opt, tx)
    state = state.replace(min_depth_bin=jnp.asarray(0.4),
                          max_depth_bin=jnp.asarray(9.0))

    folder = str(tmp_path / "ck")
    orbax_io.save_checkpoint(folder, state, opt)
    params, stats, opt_state, track = orbax_io.load_checkpoint(folder, state)

    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert jax.tree_util.tree_structure(opt_state) == (
        jax.tree_util.tree_structure(state.opt_state)
    )
    assert track["min_depth_bin"] == pytest.approx(0.4)
    assert track["backend"] == "orbax"
