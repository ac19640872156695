"""Evaluation artifacts in the reference's exact output schema.

Per-case CSV ``Patient_case,Dice,IoU,TP,TN,FP,FN``
(/root/reference/train_files/evalchaos_comparison_1cases.py:242-243, matching
the shipped golden files under train_files/examplesegmentationresults/) and
per-slice PNG masks with foreground stored as fg*63 (:234-237)."""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np
import pandas as pd

from aide_tpu.data.io import png
from aide_tpu.evaluation.case_eval import CaseResult


def write_case_csv(path: str, results: Sequence[CaseResult]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    df = pd.DataFrame(
        {
            "Patient_case": [r.case_id for r in results],
            "Dice": [r.dice for r in results],
            "IoU": [r.iou for r in results],
            "TP": [r.tp for r in results],
            "TN": [r.tn for r in results],
            "FP": [r.fp for r in results],
            "FN": [r.fn for r in results],
        }
    )
    df.to_csv(path, index=False)


def write_case_masks(
    out_dir: str,
    case_id: str,
    volume: np.ndarray,
    slice_names: Sequence[str],
    scale: int = 63,
) -> None:
    """Per-slice PNGs under <out_dir>/<case>/ (evalchaos layout)."""
    folder = os.path.join(out_dir, str(case_id))
    os.makedirs(folder, exist_ok=True)
    for name, sl in zip(slice_names, volume):
        png.write_mask(os.path.join(folder, f"{name}.png"), sl, scale=scale)


def summarize(results: Sequence[CaseResult]) -> dict:
    if not results:
        # np.mean([]) would yield NaN + RuntimeWarning and flow silently
        # into the printed JSON/CSV summary
        raise ValueError("no cases evaluated (empty result list)")
    return {
        "mean_dice": float(np.mean([r.dice for r in results])),
        "mean_iou": float(np.mean([r.iou for r in results])),
        "cases": len(results),
    }
