#!/usr/bin/env python
"""Join a profiler per-op dump (tools/profile_step.py --dump_ops) with the
optimized HLO's op_name metadata (tools/dump_hlo.py) and aggregate device
time by model component. Answers "what is that fusion.NNNN, really?" at
the module level — e.g. how the 308 ms convolution-fusion bucket of the
train step splits between large-kernel depthwise convs, the ConvFFN /
RepLKBlock 1x1 matmuls, decoders and pose.

  python tools/profile_step.py --batch 12 --dump_ops /tmp/step_ops.json
  python tools/dump_hlo.py /tmp/step.hlo --batch 12
  python tools/attr_ops.py /tmp/step_ops.json /tmp/step.hlo [--iters 4]
"""

import argparse
import collections
import json
import re

DEF_RE = re.compile(r"^\s+%([A-Za-z0-9_.-]+) = .*?op_name=\"([^\"]*)\"")


def classify(op_name: str) -> str:
    """Map an XLA op_name scope path to a model component label."""
    n = op_name
    if "cost_volume" in n or "plane_sweep" in n or "frame_diffs" in n:
        return "cost_volume"
    if "warp" in n or "grid_sample" in n or "pallas_call" in n:
        # the only non-CV pallas calls in the train step are the warp
        # kernel's fwd (jvp) and bwd (transpose_jvp) dispatches
        return "warp/sampling"
    if "large_kernel" in n or "lkb_" in n or "small_conv" in n:
        return "lk_depthwise_conv"
    m = re.search(r"blocks_(\d+)/(pw1|pw2|preffn_bn|prelkb_bn)", n)
    if m:
        blk, mod = int(m.group(1)), m.group(2)
        fam = "convffn" if blk % 2 == 1 else "replkblock"
        kind = "bn" if mod.endswith("_bn") else "1x1"
        return f"{fam}_{kind}"
    if "adpt" in n or "adapter" in n:
        return "adapters"
    if "stem" in n:
        return "stem"
    if "transition" in n or "downsample" in n:
        return "transitions"
    if "depth_dec" in n or "decoder" in n or "dispconv" in n or \
            "upconv" in n or "deconv" in n or "disp_conv" in n or \
            "mono_depth" in n or "/depth/" in n:
        return "decoder"
    if re.search(r"pose_encoder|pose_dec|_pose_pair|predict_pose", n):
        return "pose"
    if "reduce" in n and "encoder" in n:
        return "reduce_conv"
    if "loss" in n or "ssim" in n or "frame_diff" in n or "automask" in n:
        return "loss"
    if "adam" in n or "opt" in n.split("/")[-1][:3]:
        return "optimizer"
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ops_json")
    p.add_argument("hlo")
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--category", default="",
                   help="restrict to one hlo_category (e.g. 'convolution')")
    p.add_argument("--top", type=int, default=0,
                   help="also print the top N ops with their op_name")
    a = p.parse_args()

    ops = json.load(open(a.ops_json))
    names = {}
    with open(a.hlo) as f:
        for line in f:
            m = DEF_RE.match(line)
            if m and m.group(1) not in names:
                names[m.group(1)] = m.group(2)

    by_comp = collections.Counter()
    comp_cat = collections.defaultdict(collections.Counter)
    rows = []
    missing = 0.0
    for op, rec in ops.items():
        if a.category and a.category not in rec["category"]:
            continue
        op_name = names.get(op, "")
        if not op_name:
            missing += rec["us"]
        comp = classify(op_name) if op_name else f"<unmapped:{op}>"
        by_comp[comp] += rec["us"]
        comp_cat[comp][rec["category"]] += rec["us"]
        rows.append((rec["us"], op, comp, op_name))

    n = a.iters
    tot = sum(by_comp.values())
    print(f"total {tot / 1e3 / n:.2f} ms/iter"
          + (f" in category '{a.category}'" if a.category else "")
          + f"; {missing / 1e3 / n:.2f} ms/iter had no HLO op_name match")
    print(f"\n== by component (ms/iter) ==")
    for comp, us in by_comp.most_common():
        cats = ", ".join(f"{c} {u / 1e3 / n:.1f}"
                         for c, u in comp_cat[comp].most_common(3))
        print(f"{us / 1e3 / n:9.2f}  {us / tot * 100:5.1f}%  {comp:<22} "
              f"[{cats}]")
    if a.top:
        print(f"\n== top {a.top} ops ==")
        for us, op, comp, op_name in sorted(rows, reverse=True)[:a.top]:
            print(f"{us / 1e3 / n:9.2f}  {op:<28} {comp:<20} "
                  f"{op_name[-80:]}")


if __name__ == "__main__":
    main()
