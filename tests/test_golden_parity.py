"""Parity against the reference's shipped golden eval artifacts.

The reference ships, for CHAOS case 10, the predicted per-slice masks AND the
per-case metric rows its eval pipeline produced
(/root/reference/train_files/examplesegmentationresults/...). Feeding those
golden predicted masks through OUR metric/report chain must reproduce the
golden CSV numbers exactly — this validates the 3D Dice/IoU/confusion
implementations and the mask decoding conventions end to end.
"""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from aide_tpu.data.io import png
from aide_tpu.ops import metrics as M

GOLD = "/root/reference/train_files/examplesegmentationresults"
CHAOS = "/root/reference/inputs_chaos/All_Sets"

CONFIGS = [
    "fuseunet_chaoscomparison1case",
    "fuseunet_chaoscomparison30cases1labeled",
    "fuseunet_chaosproposed30cases1labeled",
]


def _load_case10(config: str):
    pred_files = sorted(glob.glob(f"{GOLD}/{config}/generated_masks/10/*.png"))
    assert pred_files, "golden masks missing"
    pred = np.stack([(png.read_mask(f) > 0).astype(np.uint8) for f in pred_files])
    gt = np.stack(
        [
            (
                png.read_mask(
                    os.path.join(CHAOS, "10/T1DUAL/Ground", os.path.basename(f))
                )
                == 63
            ).astype(np.uint8)
            for f in pred_files
        ]
    )
    csv = pd.read_csv(f"{GOLD}/{config}/{config}.csv")
    row = csv[csv["Patient_case"] == 10].iloc[0]
    return pred, gt, row


@pytest.mark.skipif(not os.path.isdir(GOLD), reason="golden artifacts absent")
@pytest.mark.parametrize("config", CONFIGS)
def test_metrics_reproduce_golden_csv(config):
    pred, gt, row = _load_case10(config)
    dice = float(M.dice3d(pred, gt))
    iou = float(M.iou3d(pred, gt))
    tp, tn, fp, fn = (float(x) for x in M.tp_tn_fp_fn_3d(pred, gt))
    assert abs(dice - row["Dice"]) < 1e-6, (dice, row["Dice"])
    assert abs(iou - row["IoU"]) < 1e-6, (iou, row["IoU"])
    assert (tp, tn, fp, fn) == (row["TP"], row["TN"], row["FP"], row["FN"])


@pytest.mark.skipif(not os.path.isdir(GOLD), reason="golden artifacts absent")
def test_golden_masks_already_largest_cc(config=CONFIGS[0]):
    """The golden volumes are post-keep-largest-CC outputs; our CC op must be
    a fixed point on them (same component survives)."""
    from aide_tpu.ops.cc import keep_largest_connected_components

    pred, _, _ = _load_case10(config)
    again = keep_largest_connected_components(pred)
    assert np.array_equal(again, pred)
