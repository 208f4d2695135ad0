"""Executable-reference oracle for the EVAL METRIC pass.

Round 3 pinned the loss+gradient pipeline against the reference's own
torch code (test_ref_loss_grad.py); the eval protocol was still verified
only against a re-stated numpy oracle. Here the reference's ACTUAL
per-image metric loop (trainer.py:777-847: cv2 resize -> 1/disp -> split
crops -> validity mask -> median scaling -> clamp -> compute_errors) is
extracted from its source file and executed unbound on shared synthetic
preds/GT, for both the eigen and cityscapes splits, and
eval/metrics.evaluate_disps must match it to float tolerance.
"""

import os
import textwrap
import types

import numpy as np
import pytest

from ppeadepth_tpu.eval import metrics as M

REF_TRAINER = "/root/reference/ppeadepth/trainer.py"
REF_EVAL = "/root/reference/ppeadepth/evaluate_depth.py"


def _extract_ref_loop():
    """Slice the per-image metric loop out of Trainer.val
    (trainer.py:777-847) so it can run without a Trainer instance."""
    src = open(REF_TRAINER).read().splitlines()
    start = next(i for i, l in enumerate(src)
                 if l.strip() == "for i in range(pred_disps.shape[0]):"
                 and i > 700)
    end = next(i for i, l in enumerate(src)
               if l.strip() == "mean_errors = np.array(errors).mean(0)"
               and i > start)
    return textwrap.dedent("\n".join(src[start:end + 1]))


def _extract_ref_compute_errors():
    """The reference's module-level compute_errors
    (evaluate_depth.py:35-53), executed from its own source."""
    src = open(REF_EVAL).read().splitlines()
    start = next(i for i, l in enumerate(src)
                 if l.startswith("def compute_errors"))
    end = next(i for i, l in enumerate(src[start:], start)
               if l.strip().startswith("return abs_rel"))
    ns = {"np": np}
    exec("\n".join(src[start:end + 1]), ns)
    return ns["compute_errors"]


def _run_reference(pred_disps, gt_depths, eval_split,
                   disable_median_scaling=False,
                   pred_depth_scale_factor=1.0):
    import cv2

    opt = types.SimpleNamespace(
        eval_split=eval_split,
        disable_median_scaling=disable_median_scaling,
        pred_depth_scale_factor=pred_depth_scale_factor,
    )
    ns = {
        "np": np, "os": os, "cv2": cv2,
        "compute_errors": _extract_ref_compute_errors(),
        "self": types.SimpleNamespace(opt=opt),
        "pred_disps": pred_disps, "gt_depths": gt_depths,
        "errors": [], "ratios": [], "mono_flag": False,
        "MIN_VAL": 1e-3, "MAX_VAL": 80,
    }
    exec(_extract_ref_loop(), ns)
    return ns["mean_errors"], np.array(ns["ratios"])


def _synthetic(split, rng, n=4):
    """Synthetic preds/GT shaped like the real splits. GT has sparse
    validity (zeros) plus out-of-range values to exercise the mask."""
    if split == "eigen":
        gh, gw, ph, pw = 375, 1242, 192, 640
    else:  # cityscapes: full-height GT; loader's 75% ego crop re-done
        gh, gw, ph, pw = 1024, 2048, 192, 512
    gts, preds = [], []
    for _ in range(n):
        gt = rng.rand(gh, gw).astype(np.float64) * 100.0
        gt[rng.rand(gh, gw) < 0.7] = 0.0  # sparse lidar-like validity
        gt[rng.rand(gh, gw) < 0.01] = 90.0  # above MAX_VAL
        gts.append(gt)
        preds.append((rng.rand(ph, pw).astype(np.float32) * 0.9 + 0.05))
    return np.stack(preds), gts


@pytest.mark.parametrize("median", [False, True])
def test_eigen_metrics_match_reference(median, rng):
    preds, gts = _synthetic("eigen", rng)

    class NpzLike:  # trainer.py:767 indexes gt_depths[i]
        def __getitem__(self, i):
            return gts[i]

    ref_err, ref_ratios = _run_reference(
        preds, NpzLike(), "eigen", disable_median_scaling=not median)
    got_err, got_ratios = M.evaluate_disps(
        preds, gts, "eigen", disable_median_scaling=not median)
    np.testing.assert_allclose(got_err, ref_err, rtol=1e-9)
    np.testing.assert_allclose(got_ratios, ref_ratios, rtol=1e-9)


def test_eigen_scale_factor_matches_reference(rng):
    preds, gts = _synthetic("eigen", rng, n=2)

    class NpzLike:
        def __getitem__(self, i):
            return gts[i]

    ref_err, _ = _run_reference(preds, NpzLike(), "eigen",
                                disable_median_scaling=True,
                                pred_depth_scale_factor=5.4)
    got_err, _ = M.evaluate_disps(preds, gts, "eigen",
                                  disable_median_scaling=True,
                                  pred_depth_scale_factor=5.4)
    np.testing.assert_allclose(got_err, ref_err, rtol=1e-9)


def test_cityscapes_metrics_match_reference(rng, tmp_path):
    """The cityscapes branch loads per-image NNN_depth.npy files from a
    directory and re-does the 75% ego-crop + [256:, 192:1856] centre
    crop (trainer.py:779-805)."""
    preds, gts = _synthetic("cityscapes", rng)
    d = tmp_path / "gt_depths"
    os.makedirs(d)
    for i, gt in enumerate(gts):
        np.save(str(d / f"{str(i).zfill(3)}_depth.npy"), gt)

    ref_err, ref_ratios = _run_reference(preds, str(d), "cityscapes")
    got_err, got_ratios = M.evaluate_disps(preds, gts, "cityscapes")
    np.testing.assert_allclose(got_err, ref_err, rtol=1e-9)
    np.testing.assert_allclose(got_ratios, ref_ratios, rtol=1e-9)
