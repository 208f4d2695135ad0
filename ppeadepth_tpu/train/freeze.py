"""Parameter freezing as an optimizer-side partition (TPU-idiomatic).

The reference freezes with `requires_grad = False` name predicates
(repdepth.py:47-66 for the student encoder, :121-140 for the teacher,
dc_ft_init :256-262 for stage-2 decoders, freeze_tp_net :404-426,
freeze_pose_net :428-440). In jax we instead *partition* the param tree
into (trainable, frozen): the loss closes over the frozen subtree, grads
are only taken for the trainable one — XLA then dead-code-eliminates the
frozen weight-gradient computations, and Adam state is only allocated for
trainable leaves (the partial-freeze optimizer memory win called out in
SURVEY §7 hard-part 6).

Name predicates are preserved exactly:
  student encoder: trainable iff 'adpt' | 'adapter' | 'reduce' | 'bn'
  teacher encoder: trainable iff 'adpt' | 'adapter' | 'bn'   (no 'reduce')
  stage-1 decoders + pose nets: fully trainable
  stage-2 (dc): decoders trainable iff 'adpt' | 'adapter';
                dec_id 5/6 restrict encoder adapters to the last block(s)
                of each stage (repdepth.py:52-63)
"""

from __future__ import annotations

from typing import Dict

import jax
from flax import traverse_util

from ..options import Config

TRAIN = "trainable"
FROZEN = "frozen"

# last-(RepLK,FFN)-block-pair indices per stage for dec_id 5/6
# (torch '3.blocks.3' etc. — block lists have 2*layers entries)
_DEC5_KEEP = {("stages_0", "blocks_3"), ("stages_1", "blocks_3"),
              ("stages_2", "blocks_35"), ("stages_3", "blocks_3")}
_DEC6_KEEP = _DEC5_KEEP | {
    ("stages_0", "blocks_2"), ("stages_1", "blocks_2"),
    ("stages_2", "blocks_34"), ("stages_3", "blocks_2"),
}


def _adapterish(path: str) -> bool:
    return "adpt" in path or "adapter" in path


def _encoder_label(path: str, opt: Config, is_student: bool) -> str:
    predicates = ("adpt", "adapter", "bn") + (
        ("reduce",) if is_student else ()
    )
    trainable = any(p in path for p in predicates)
    if not trainable:
        return FROZEN
    if opt.dc and opt.dec_id in (5, 6) and "adapter" in path:
        keep = _DEC5_KEEP if opt.dec_id == 5 else _DEC6_KEEP
        parts = path.split("/")
        pairs = {
            (parts[i], parts[i + 1])
            for i in range(len(parts) - 1)
        }
        if not (pairs & keep):
            return FROZEN
    return TRAIN


def param_labels(params: Dict, opt: Config) -> Dict:
    """Label tree ('trainable'/'frozen') with the same structure as params."""
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for key in flat:
        path = "/".join(str(k) for k in key)
        top = key[0]
        if not opt.adapter or opt.fullft_reb:
            label = TRAIN
        elif top == "encoder":
            label = _encoder_label(path, opt, is_student=True)
        elif top == "mono_encoder":
            label = _encoder_label(path, opt, is_student=False)
        elif top in ("depth", "mono_depth"):
            if opt.dc:
                label = TRAIN if _adapterish(path) else FROZEN
            else:
                label = TRAIN
        else:  # pose_encoder, pose
            label = TRAIN
        # global freeze modes
        if opt.adapter and not opt.fullft_reb and opt.dec_only and top in (
            "encoder", "mono_encoder",
        ):
            label = FROZEN
        if opt.lps2 and top in ("encoder", "mono_encoder"):
            label = FROZEN
        if opt.freeze_teacher_and_pose and top in (
            "mono_encoder", "mono_depth", "pose_encoder", "pose",
        ):
            label = FROZEN
        if opt.freeze_pose and top in ("pose_encoder", "pose"):
            label = FROZEN
        labels[key] = label
    return traverse_util.unflatten_dict(labels)


def partition(params: Dict, labels: Dict):
    """Split params into (trainable, frozen) flat-path dicts."""
    flat_p = traverse_util.flatten_dict(params)
    flat_l = traverse_util.flatten_dict(labels)
    trainable = {k: v for k, v in flat_p.items() if flat_l[k] == TRAIN}
    frozen = {k: v for k, v in flat_p.items() if flat_l[k] == FROZEN}
    return trainable, frozen


def merge(trainable: Dict, frozen: Dict) -> Dict:
    """Rebuild the nested param tree from the two flat partitions."""
    flat = dict(trainable)
    flat.update(frozen)
    return traverse_util.unflatten_dict(flat)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def print_num_param(params: Dict, labels: Dict):
    """Per-submodule trainable/total counts (repdepth.py:511-526)."""
    flat_p = traverse_util.flatten_dict(params)
    flat_l = traverse_util.flatten_dict(labels)
    mods = {}
    for k, v in flat_p.items():
        top = k[0]
        t, n = mods.get(top, (0, 0))
        mods[top] = (
            t + (v.size if flat_l[k] == TRAIN else 0), n + v.size
        )
    for mod, (t, n) in sorted(mods.items()):
        print(f"for {mod} ", t, n)
    return mods
