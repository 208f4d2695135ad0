"""torch -> jax checkpoint importer.

Reads the reference's `model.pth` (a full RepDepth state_dict,
trainer.py:1290-1321) or a raw RepLKNet ImageNet checkpoint
(`RepLKNet-31B_ImageNet-1K_224.pth`) and maps it onto our param /
batch_stats trees. Layout transforms:

  conv      torch [O, I, kh, kw]      -> flax HWIO [kh, kw, I, O]
  depthwise torch [C, 1, kh, kw]      -> flax [kh, kw, 1, C]
  linear    torch [out, in]           -> flax Dense [in, out]
  deconv    torch [I, O, kh, kw]      -> ours   [kh, kw, I, O] (module
            flips spatially at use, see ConvTranspose3x3s2)
  BN        weight/bias -> scale/bias; running_mean/var -> batch_stats

Name mapping is rule-based from our flax paths (see `_to_torch_name`),
so the inverse (export) is exact — round-tripped in tests.
2-image stem inflation for the pose encoder / matching stem follows
replknet_adapter.py:475-477 / resnet_encoder.py:62-70 (concat along input
channels, divided by the image count).
"""

from __future__ import annotations

import glob
import os
import re
import sys
from typing import Dict, Tuple

import numpy as np
from flax import traverse_util


def _to_torch_name(path: Tuple[str, ...]) -> str:
    """Map a flax param path (without the leaf name) to the reference's
    torch module name."""
    parts = []
    for p in path:
        # list-attribute naming: stem_0 -> stem.0, stages_2 -> stages.2 ...
        m = re.fullmatch(r"(stem|stages|blocks|transitions|upconvs_0|"
                         r"upconvs_1|upconv_0|upconv_1|dispconvs|"
                         r"layer1|layer2|layer3|layer4|"
                         r"up_adapters|trans_adapters|trans_drop_paths)_(\d+)",
                         p)
        if m:
            name = m.group(1)
            if name == "up_adapters":
                # dec_id-10 decoder adapters: `self.adapters` ModuleList
                # (depth_decoder_v2.py:156-159)
                name = "adapters"
            parts.append(f"{name}.{m.group(2)}")
        elif p == "expand":  # Transition part 0 (1x1 conv-bn-relu)
            parts.append("0")
        elif p == "down":  # Transition part 1 (dw 3x3 s2)
            parts.append("1")
        elif p == "disp_conv":
            parts.append("disp_convs.0")
        elif p == "trans_adapters":
            parts.append("trans_adpt")
        elif p == "reduce_conv":
            parts.append("reduce_conv.0")
        elif p == "downsample_conv":
            parts.append("downsample.0")
        elif p == "downsample_bn":
            parts.append("downsample.1")
        elif p == "squeeze":
            parts.append("net.0")
        elif p == "pose_0":
            parts.append("net.1")
        elif p == "pose_1":
            parts.append("net.2")
        elif p == "pose_2":
            parts.append("net.3")
        else:
            parts.append(p)
    name = ".".join(parts)
    # torchvision resnet lives under pose_encoder.encoder.*
    name = re.sub(r"^pose_encoder\.", "pose_encoder.encoder.", name)
    # ConvBlock: our ConvBlock/conv(Conv3x3)/conv(nn.Conv) == torch
    # ConvBlock.conv(Conv3x3).conv(nn.Conv2d) — names already align.
    return name


def _convert_leaf(torch_arr: np.ndarray, leaf: str, parent: str,
                  target_shape) -> np.ndarray:
    a = np.asarray(torch_arr, dtype=np.float32)
    if leaf == "kernel":
        if a.ndim == 4:
            if "deconv_adpt" in parent:
                # ConvTranspose [I, O, kh, kw] -> [kh, kw, I, O]
                a = a.transpose(2, 3, 0, 1)
            elif a.shape[1] == 1 and target_shape[2] == 1:
                # depthwise [C,1,kh,kw] -> [kh,kw,1,C]
                a = a.transpose(2, 3, 1, 0)
            else:
                a = a.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif a.ndim == 2:
            a = a.T  # linear
    return a


def _torch_leaf_name(leaf: str, parent_is_bn: bool) -> str:
    if parent_is_bn:
        return {"scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}[leaf]
    return {"kernel": "weight", "bias": "bias"}.get(leaf, leaf)


def _is_bn_module(path: Tuple[str, ...]) -> bool:
    last = path[-1]
    return (
        "bn" in last
        or last in ("prelkb_bn", "preffn_bn", "norm")
    )


def map_state_dict(
    state_dict: Dict[str, np.ndarray],
    template_params: Dict,
    template_stats: Dict,
    prefix: str = "",
    num_input_images: int = 1,
    verbose: bool = False,
):
    """Merge a torch state_dict into (params, batch_stats) templates.
    Returns (params, batch_stats, n_loaded, missing_names)."""
    flat_p = traverse_util.flatten_dict(template_params)
    flat_s = traverse_util.flatten_dict(template_stats)

    def lookup(path, leaf, is_stats):
        parent = _to_torch_name(path)
        tname = _torch_leaf_name(leaf, _is_bn_module(path))
        return f"{parent}.{tname}" if parent else tname

    out_p, out_s = {}, {}
    loaded, missing = 0, []
    for flat, out, is_stats in ((flat_p, out_p, False), (flat_s, out_s, True)):
        for key, tmpl in flat.items():
            *path, leaf = key
            name = prefix + lookup(tuple(path), leaf, is_stats)
            if name in state_dict:
                a = _convert_leaf(
                    state_dict[name], leaf, ".".join(path), tmpl.shape
                )
                if (
                    leaf == "kernel" and a.ndim == 4
                    and a.shape != tuple(tmpl.shape)
                    and a.shape[2] * num_input_images == tmpl.shape[2]
                ):
                    # stem inflation for multi-image inputs
                    a = np.concatenate([a] * num_input_images, axis=2)
                    a = a / num_input_images
                if a.shape != tuple(tmpl.shape):
                    missing.append(f"{name} (shape {a.shape} vs {tmpl.shape})")
                    out[key] = tmpl
                else:
                    out[key] = a.astype(np.asarray(tmpl).dtype)
                    loaded += 1
            else:
                missing.append(name)
                out[key] = tmpl
    if verbose and missing:
        print(f"[torch_import] {loaded} loaded, {len(missing)} missing; "
              f"first missing: {missing[:5]}")
    return (
        traverse_util.unflatten_dict(out_p),
        traverse_util.unflatten_dict(out_s),
        loaded,
        missing,
    )


def export_state_dict(params: Dict, batch_stats: Dict) -> Dict:
    """Inverse mapping (ours -> torch-style names) for round-trip tests
    and for tooling that expects reference-shaped checkpoints."""
    out = {}
    for tree, is_stats in ((params, False), (batch_stats, True)):
        for key, val in traverse_util.flatten_dict(tree).items():
            *path, leaf = key
            name = _to_torch_name(tuple(path))
            tname = _torch_leaf_name(leaf, _is_bn_module(tuple(path)))
            full = f"{name}.{tname}" if name else tname
            a = np.asarray(val)
            if leaf == "kernel":
                if a.ndim == 4:
                    if "deconv_adpt" in ".".join(path):
                        a = a.transpose(2, 3, 0, 1)
                    else:
                        a = a.transpose(3, 2, 0, 1)  # HWIO -> OIHW
                elif a.ndim == 2:
                    a = a.T
            out[full] = a
    return out


def translate_legacy_state_dict(sd: Dict, kind: str) -> Dict:
    """Rename a ManyDepth-style legacy checkpoint (the separate-file
    format consumed by eval_depth_ori.py:119-190) into our naming scheme
    so `map_state_dict` can ingest it.

    kind='encoder' (ResnetEncoderMatching, resnet_encoder.py:75-364):
      layer0.{0,1} = Sequential(conv1, bn1) -> conv1 / bn1
      layer1.1.{i} = Sequential(maxpool, layer1)[1] -> layer1.{i}
      reduce_conv.0 stays (matches the `reduce_conv -> reduce_conv.0`
        rule in _to_torch_name)
      prematching_conv.* dropped (dead: never called in forward)
    kind='decoder' (Monodepth2 DepthDecoder, depth_decoder.py:15-63;
    module list order: (upconv i 0/1) for i=4..0 then dispconv 0..3):
      decoder.{2k}   -> upconv_0.{4-k}
      decoder.{2k+1} -> upconv_1.{4-k}
      decoder.{10+s} -> dispconvs.{s}
    kind='pose_encoder'/'pose': already in our scheme (encoder.* / net.*).
    """
    out = {}
    for name, v in sd.items():
        if kind == "encoder":
            if name.startswith("prematching_conv"):
                continue
            name = re.sub(r"^layer0\.0\.", "conv1.", name)
            name = re.sub(r"^layer0\.1\.", "bn1.", name)
            name = re.sub(r"^layer1\.1\.(\d+)\.", r"layer1.\1.", name)
        elif kind == "decoder":
            m = re.match(r"^decoder\.(\d+)\.(.*)$", name)
            if m:
                n, rest = int(m.group(1)), m.group(2)
                if n < 10:
                    name = f"upconv_{n % 2}.{4 - n // 2}.{rest}"
                else:
                    name = f"dispconvs.{n - 10}.{rest}"
        out[name] = v
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth into numpy (requires torch, CPU-only)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(blob, "state_dict"):
        blob = blob.state_dict()
    if "model" in blob and isinstance(blob["model"], dict):
        blob = blob["model"]
    if "state_dict" in blob and isinstance(blob["state_dict"], dict):
        blob = blob["state_dict"]
    return {k: v.detach().numpy() for k, v in blob.items()
            if hasattr(v, "detach")}


def load_torch_repdepth(path: str, template_params: Dict,
                        template_stats: Dict, verbose: bool = True):
    """Import a reference model.pth into our RepDepth trees."""
    sd = load_torch_checkpoint(path)
    return map_state_dict(
        sd, template_params, template_stats, verbose=verbose
    )


# ImageNet checkpoint filenames the reference hardcodes per size
# (repdepth.py:84-88, replk_matching_adapter.py:46-51). XL has no live
# bootstrap path in the reference snapshot (repdepth.py:89 raises before
# selecting one); we accept the official RepLKNet release name.
REPLK_IMAGENET_FILES = {
    "b": "RepLKNet-31B_ImageNet-1K_224.pth",
    "l": "RepLKNet-31L_ImageNet-22K.pth",
    "xl": "RepLKNet-XL_MegData73M_pretrain.pth",
}


def bootstrap_pretrained(variables, opt, verbose: bool = True):
    """From-scratch training bootstrap: load the RepLKNet ImageNet
    checkpoint into BOTH backbones and (if a file is available) a
    torchvision resnet18 state_dict into the 2-image pose encoder.

    Mirrors the reference's constructor-time loads: the matching encoder
    and teacher encoder both read `./pretrained/RepLKNet-31{B,L}…pth`
    unconditionally (repdepth.py:84-111, replk_matching_adapter.py:46-67),
    and the pose ResnetEncoder is torchvision-pretrained iff
    `--weights_init pretrained` (repdepth.py:155, resnet_encoder.py:385-392
    — the multi-image stem concatenates the 1-image kernel and divides by
    the image count, resnet_encoder.py:62-70).

    Missing RepLKNet file is an ERROR, not a silent random init: a run
    started from random backbones can never reach the paper's numbers.
    The torchvision file (`resnet18*.pth` in the same directory) is
    optional with a loud warning — the reference downloads it at runtime;
    this environment has no network egress.
    """
    fname = REPLK_IMAGENET_FILES.get(
        opt.rep_size, f"RepLKNet-{opt.rep_size}.pth"
    )
    path = os.path.join(opt.backbone_weights, fname)
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"--weights_init pretrained: backbone checkpoint {path!r} not "
            "found. Download the RepLKNet ImageNet release there, point "
            "--backbone_weights at its directory, or pass "
            "--weights_init scratch to (knowingly) train from random "
            "backbones."
        )
    sd = load_torch_checkpoint(path)
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])

    mp, ms, n_mono, miss_m = map_state_dict(
        sd, params["mono_encoder"], stats["mono_encoder"]
    )
    enc_p = dict(params["encoder"])
    enc_s = dict(stats["encoder"])
    ep, es, n_match, miss_e = map_state_dict(
        sd, enc_p["replk"], enc_s["replk"]
    )
    if n_mono == 0 or n_match == 0:
        raise ValueError(
            f"backbone checkpoint {path!r} matched no parameters "
            f"(mono {n_mono}, matching {n_match}) — wrong --rep_size?"
        )
    params["mono_encoder"], stats["mono_encoder"] = mp, ms
    enc_p["replk"], enc_s["replk"] = ep, es
    params["encoder"], stats["encoder"] = enc_p, enc_s
    if verbose:
        print(f"[bootstrap] {fname}: mono_encoder {n_mono} tensors, "
              f"matching encoder {n_match} tensors "
              f"(adapters/decoders stay at init: {len(miss_m)} skipped)")

    n_pose = 0
    pose_files = sorted(
        glob.glob(os.path.join(opt.backbone_weights, "resnet18*.pth"))
    )
    if pose_files and "pose_encoder" in params:
        psd = load_torch_checkpoint(pose_files[0])
        pp, ps, n_pose, _ = map_state_dict(
            psd, params["pose_encoder"], stats["pose_encoder"],
            num_input_images=2,
        )
        if n_pose:
            params["pose_encoder"], stats["pose_encoder"] = pp, ps
            if verbose:
                print(f"[bootstrap] {os.path.basename(pose_files[0])}: "
                      f"pose_encoder {n_pose} tensors "
                      "(2-image stem inflated)")
        else:
            # a file that matches ZERO tensors is as dangerous as a
            # missing one (silent random pose encoder) — warn loudly,
            # unconditionally, like the missing-file branch below.
            print(f"[bootstrap] WARNING: {pose_files[0]!r} matched 0 "
                  "pose_encoder tensors (wrong or corrupt file?) — pose "
                  "encoder starts from random", file=sys.stderr)
    elif verbose and "pose_encoder" in params:
        print("[bootstrap] WARNING: no resnet18*.pth in "
              f"{opt.backbone_weights!r} — pose encoder starts from "
              "random (the reference uses torchvision pretrained=True)")

    out = dict(variables)
    out["params"], out["batch_stats"] = params, stats
    return out


def load_torch_replknet_backbone(
    path: str, template_params: Dict, template_stats: Dict,
    num_input_images: int = 1, verbose: bool = True,
):
    """Import a raw RepLKNet ImageNet checkpoint into one backbone tree
    (the `pretrained=` path of replknet.py:261-268)."""
    sd = load_torch_checkpoint(path)
    return map_state_dict(
        sd, template_params, template_stats,
        num_input_images=num_input_images, verbose=verbose,
    )
