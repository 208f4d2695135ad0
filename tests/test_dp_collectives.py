"""DP scaling guarantee: the sharded train step's all-reduce volume is the
TRAINABLE partition (grads) + BN batch stats + metric scalars — the frozen
backbone never touches the interconnect.

Reference contrast: accelerate/DDP all-reduces every requires_grad
parameter's gradient bucket (reference trainer.py:220-222 wraps the model
in DDP; PPEA freezes by requires_grad so the frozen encoder is skipped
there too). Here freezing is a param partition (train/freeze.py): grads
are taken over `state.trainable` only (train/step.py:358-366), so under
GSPMD the gradient all-reduce bytes are structurally bounded by the
trainable tree. This test pins that property in the compiled HLO — a
regression (e.g. accidentally differentiating the merged tree, or a
replicated->sharded resharding of frozen params) would show up as excess
collective bytes and destroy multi-chip scaling.

Measured constant (pinned below): the volume is 2.003x the trainable
bytes, not 1x — the SPMD partitioner reduces each gradient once for
Adam's m-update (consumes g) and once for the v-update (consumes g**2,
which must be squared AFTER the cross-device mean), and does not CSE the
two all-reduces. `lax.optimization_barrier` on the grad tree and
`with_sharding_constraint(g, replicated)` were both tried and change
nothing (partial-sum state is internal to the partitioner, not part of
the annotated sharding). Cost at v5e-8 scale: 2 x ~20M trainable params
x 4B ~= 160 MB/step over ICI ~= 1.6 ms, ~0.3% of the 476 ms step — not
worth splitting the optimizer into a second jit. What matters for
scaling is that the 4x-larger frozen backbone never rides the
interconnect, which the upper bound enforces.
"""

import re

import jax
import numpy as np

from ppeadepth_tpu.parallel import mesh as M
from ppeadepth_tpu.train.step import make_train_step

from test_train_step import TINY, init_model_state, make_batch

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

# result shapes of an HLO op line: `%x = f32[12,34]{1,0} all-reduce(...)`
# or tuple results `%x = (f32[8]{0}, bf16[16]{0}) all-reduce-start(...)`.
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _collective_bytes(hlo_text, op_names=("all-reduce", "all-reduce-start",
                                          "reduce-scatter")):
    """Sum result bytes of every collective-reduction op in the HLO."""
    total = 0
    per_op = []
    for line in hlo_text.splitlines():
        if not any(f" {op}(" in line for op in op_names):
            continue
        lhs = line.split(" all-reduce")[0].split(" reduce-scatter")[0]
        if "=" not in lhs:
            continue
        result = lhs.split("=", 1)[1]
        op_bytes = 0
        for dt, dims in _SHAPE_RE.findall(result):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            op_bytes += n * _DTYPE_BYTES[dt]
        per_op.append((op_bytes, line.strip()[:120]))
        total += op_bytes
    return total, per_op


def _tree_bytes(tree):
    return sum(np.prod(x.shape, dtype=int) * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))


def test_dp_allreduce_volume_is_trainable_partition_only():
    assert len(jax.devices()) >= 8
    opt = TINY.replace(no_matching_augmentation=True)
    model, state, tx, _ = init_model_state(opt, 8)
    batch = make_batch(opt, 8)
    step_fn = make_train_step(model, opt, tx, donate=False)

    mesh = M.make_mesh(8)
    state_r = M.replicate(state, mesh)
    batch_s = M.shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(7)

    hlo = step_fn.lower(state_r, batch_s, rng).compile().as_text()
    ar_bytes, per_op = _collective_bytes(hlo)

    trainable_b = _tree_bytes(state.trainable)
    frozen_b = _tree_bytes(state.frozen)
    stats_b = _tree_bytes(state.batch_stats)

    # the grad all-reduce must exist and carry (at least) the trainable tree
    assert ar_bytes >= trainable_b, (ar_bytes, trainable_b)

    # ... and nothing structurally larger: 2x trainable (the partitioner's
    # separate m-/v-path gradient reductions, see module docstring), BN
    # cross-batch stat reductions (bounded by ~2x the stats tree: partial
    # sums + sums-of-squares), plus a scalar budget for loss metrics /
    # depth-bin EMA / rng plumbing.
    scalar_slack = 64 * 1024
    bound = 2 * trainable_b + 2 * stats_b + scalar_slack
    assert ar_bytes <= bound, (
        f"collective volume {ar_bytes}B exceeds 2x-trainable+stats bound "
        f"{bound}B — is the frozen partition being reduced?\n" +
        "\n".join(f"{b:>10}B {l}" for b, l in
                  sorted(per_op, reverse=True)[:10]))

    # the bound is only meaningful if the frozen partition is big enough
    # that reducing it would trip the assert
    assert frozen_b > 2 * stats_b + scalar_slack


def test_dp_allreduce_volume_stage2_dc_partition():
    """Stage-2 (--dc) wire: only the ADAPTER partition rides ICI.

    The dc fine-tune freezes the decoder trunks and trains the
    adapters (dc_ft_init, reference repdepth.py:256-262; our
    freeze.param_labels dc branch) — an accidental all-reduce of the
    full decoders (or the frozen backbone) would hide exactly here,
    where the trainable tree is smallest. Same HLO accounting as the
    stage-1 test: collective bytes in [trainable, 2x trainable +
     2x stats + scalar slack]."""
    assert len(jax.devices()) >= 8
    opt = TINY.replace(no_matching_augmentation=True, dc=True, dec_id=1)
    model, state, tx, _ = init_model_state(opt, 8)
    batch = make_batch(opt, 8)
    step_fn = make_train_step(model, opt, tx, donate=False)

    mesh = M.make_mesh(8)
    state_r = M.replicate(state, mesh)
    batch_s = M.shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(7)

    hlo = step_fn.lower(state_r, batch_s, rng).compile().as_text()
    ar_bytes, per_op = _collective_bytes(hlo)

    trainable_b = _tree_bytes(state.trainable)
    frozen_b = _tree_bytes(state.frozen)
    stats_b = _tree_bytes(state.batch_stats)

    # dc actually shrank the wire: the decoder trunks moved to frozen
    assert any(k[0] in ("depth", "mono_depth") for k in state.frozen), \
        "dc config did not freeze the decoder trunks"

    assert ar_bytes >= trainable_b, (ar_bytes, trainable_b)
    scalar_slack = 64 * 1024
    bound = 2 * trainable_b + 2 * stats_b + scalar_slack
    assert ar_bytes <= bound, (
        f"stage-2 collective volume {ar_bytes}B exceeds bound {bound}B — "
        f"is a frozen decoder being reduced?\n" +
        "\n".join(f"{b:>10}B {l}" for b, l in
                  sorted(per_op, reverse=True)[:10]))
    assert frozen_b > 2 * stats_b + scalar_slack
