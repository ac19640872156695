"""Real-data CHAOS reproduction on the shipped cases.

The reference ships complete DICOM + ground-truth data for exactly the two
cases its flagship 1-case config uses: case 37 (the single labeled training
case of splitcases/train_data_1cases.csv) and case 10 (a validation case,
for which the golden eval artifacts report Dice 0.479 for this config,
train_files/examplesegmentationresults/fuseunet_chaoscomparison1case).

This experiment runs the real chaos_comparison_1case setup end to end on
that shipped data: train FuseUNet on case 37's 30 DICOM slice pairs,
validate per-epoch on case 10, and report the final case-10 Dice — the
closest possible real-data reproduction without the full CHAOS download.

Usage: python experiments/chaos_real_1case.py [--epochs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SPLIT = "/root/reference/inputs_chaos/All_Sets_split"
REF_ROOT = "/root/reference/inputs_chaos/All_Sets"


def make_csvs(workdir: str):
    """Reduce the reference CSVs to the shipped cases (37 train, 10 val)."""
    import pandas as pd

    os.makedirs(workdir, exist_ok=True)
    train_csv = os.path.join(REF_SPLIT, "splitimages_cleanlabel/train_data_1cases.csv")
    val_csv = os.path.join(REF_SPLIT, "splitimages_cleanlabel/val_data_10cases.csv")

    df = pd.read_csv(val_csv)
    df10 = df[df["Inphase"].str.startswith("10/")]
    assert len(df10) > 0
    val_out = os.path.join(workdir, "val_case10.csv")
    df10.to_csv(val_out, index=False)

    tc = os.path.join(workdir, "traincases.csv")
    pd.DataFrame({"patient_case": [37]}).to_csv(tc, index=False)
    vc = os.path.join(workdir, "valcases.csv")
    pd.DataFrame({"patient_case": [10]}).to_csv(vc, index=False)
    return train_csv, val_out, tc, vc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--workdir", default="/tmp/chaos_real_1case")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from aide_tpu.core.config import TrainConfig, ModelConfig
    from aide_tpu.engine.trainer import Trainer

    train_csv, val_csv, tc, vc = make_csvs(args.workdir)

    cfg = TrainConfig()
    cfg.model = ModelConfig(name="fuseunet", compute_dtype="bfloat16")
    cfg.data.task = "chaos"
    cfg.data.variant = "comparison"
    cfg.data.root = REF_ROOT
    cfg.data.train_csv = train_csv
    cfg.data.test_csv = val_csv
    cfg.data.traincase_csv = tc
    cfg.data.testcase_csv = vc
    cfg.data.img_size = 256
    cfg.data.batch_size = 4
    cfg.data.eval_batch_size = 8
    cfg.num_epochs = args.epochs
    cfg.repetition = 2
    cfg.checkpoint_dir = os.path.join(args.workdir, "ckpt")
    cfg.history_dir = os.path.join(args.workdir, "hist")

    t0 = time.time()
    trainer = Trainer(cfg)
    history = trainer.run(args.epochs)
    best = max(r["testcase_dice1"] for r in history)
    result = {
        "config": "chaos_comparison_1case (shipped cases 37->10)",
        "epochs": args.epochs,
        "train_slices": len(trainer.train_pipe),
        "val_slices": len(trainer.test_pipe),
        "final_case10_dice": history[-1]["testcase_dice1"],
        "best_case10_dice": best,
        "golden_reference_case10_dice": 0.479,
        "minutes": round((time.time() - t0) / 60, 1),
    }
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
