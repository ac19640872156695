"""Real-DICOM co-teaching: the flagship AIDE proposed path on shipped data.

The dual-net proposed algorithm (TTA ensembling + cross small-loss exchange
+ label refresh) had only ever run on synthetic renders; this experiment
runs it end to end on the reference's shipped CHAOS DICOM — the exact
machinery of the `chaos_proposed_30cases1labeled` preset
(/root/reference/train_files/trainchaos_proposed_30cases1labeled.py), scaled
to the two cases whose images ship with the repo:

  - case 37: the single LABELED case (ground-truth masks, refresh-exempt,
    splitcases/train_data_1cases.csv) — 30 slice pairs
  - case 10: pseudo-labeled from the shipped bootstrap masks
    (generated_masks/pretrain_1case_fuseunet_r1/10/, the 1-case-pretrain
    model's predictions, measured bootstrap quality Dice 0.383 vs GT) —
    50 slice pairs, the only refreshable case
  - test: case 10 scored against its ground truth (the val-set case for
    which the golden eval artifacts pin Dice 0.479 for the supervised
    1-case comparison config)

Deviation from the flagship config, forced by the 2-case dataset:
`update_percent` is raised 0.25 -> 0.5 so the per-net worst-k refresh
selects k = int(0.5 * 2) = 1 case per epoch (the reference's 0.25 over 30
cases gives k = 7; at 2 cases it gives k = 0 and the refresh loop would
never run). Case 37 stays exempt either way, so each refresh rewrites at
most case 10's working labels — the transfer-style regime where the
algorithm mines label quality out of unlabeled data.

An oracle hook measures the true working-label quality of case 10 (Dice vs
ground truth) after every refresh — the same instrumentation as the
synthetic transfer ladder (experiments/synthetic_aide.py), so the result
table can show whether refresh IMPROVES the labels on real DICOM like it
does on synthetic.

The reference root is read-only; a /tmp work root symlinks the case folders
and pseudo-masks while tempmasks/checkpoints write locally.

Usage: python experiments/chaos_real_proposed.py [--epochs N] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_ROOT = "/root/reference/inputs_chaos/All_Sets"
REF_SPLIT = "/root/reference/inputs_chaos/All_Sets_split"
PSEUDO_REL = "generated_masks/pretrain_1case_fuseunet_r1"


def make_workdir(workdir: str):
    """Writable data root (symlinked cases) + train/test/case CSVs."""
    import pandas as pd

    root = os.path.join(workdir, "root")
    os.makedirs(root, exist_ok=True)
    for name in ("10", "37", "generated_masks"):
        link = os.path.join(root, name)
        if not os.path.lexists(link):
            os.symlink(os.path.join(REF_ROOT, name), link)

    # case 37 rows of the proposed 30-case CSV carry its GROUND-TRUth masks
    # (the labeled case); case 10 rows are constructed from the val CSV with
    # the Mask column pointed at the shipped bootstrap pseudo-labels
    df30 = pd.read_csv(
        os.path.join(REF_SPLIT, "splitimages_pseudolabels_1pretrain/train_data_30cases.csv")
    )
    rows37 = df30[df30["Inphase"].str.startswith("37/")]
    assert len(rows37) == 30, len(rows37)

    dfval = pd.read_csv(
        os.path.join(REF_SPLIT, "splitimages_cleanlabel/val_data_10cases.csv")
    )
    rows10 = dfval[dfval["Inphase"].str.startswith("10/")].copy()
    assert len(rows10) == 50, len(rows10)
    rows10["Mask"] = rows10["Inphase"].map(
        lambda p: f"{PSEUDO_REL}/10/{os.path.basename(p).rsplit('.', 1)[0]}.png"
    )
    for m in rows10["Mask"]:
        assert os.path.exists(os.path.join(root, m)), m

    train_csv = os.path.join(workdir, "train_37gt_10pseudo.csv")
    pd.concat([rows37, rows10]).to_csv(train_csv, index=False)
    test_csv = os.path.join(workdir, "test_case10_gt.csv")
    dfval[dfval["Inphase"].str.startswith("10/")].to_csv(test_csv, index=False)

    def case_csv(name, cases):
        p = os.path.join(workdir, name)
        pd.DataFrame({"patient_case": cases}).to_csv(p, index=False)
        return p

    return (
        root,
        train_csv,
        test_csv,
        case_csv("traincases.csv", [37, 10]),
        case_csv("testcases.csv", [10]),
        case_csv("labelcases.csv", [37]),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--workdir", default="/tmp/chaos_real_proposed")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import numpy as np

    from aide_tpu.core.config import ModelConfig, TrainConfig
    from aide_tpu.engine.trainer import Trainer
    from aide_tpu.evaluation.case_eval import dice3d_np

    root, train_csv, test_csv, tc, vc, lc = make_workdir(args.workdir)

    cfg = TrainConfig()
    # the flagship production mode: packed bf16 FuseUNet (bench.py, presets)
    cfg.model = ModelConfig(name="fuseunet", compute_dtype="bfloat16", packed=True)
    cfg.data.task = "chaos"
    cfg.data.variant = "proposed"
    cfg.data.root = root
    cfg.data.train_csv = train_csv
    cfg.data.test_csv = test_csv
    cfg.data.traincase_csv = tc
    cfg.data.testcase_csv = vc
    cfg.data.labelcase_csv = lc
    cfg.data.tempmask_folder = "tempmasks_real_proposed"
    cfg.data.decode_cache_dir = os.path.join(args.workdir, "decode_cache")
    cfg.data.eval_batch_size = 32
    cfg.coteach.update_percent = 0.5  # k=1 of 2 cases (see module docstring)
    cfg.num_epochs = args.epochs
    cfg.checkpoint_dir = os.path.join(args.workdir, "ckpt")
    cfg.history_dir = os.path.join(args.workdir, "hist")
    cfg.repetition = 5  # experiment tag (experiment_name derives from it)

    t0 = time.time()
    trainer = Trainer(cfg)

    # working-label oracle for case 10 (GT from the test pipe — the train
    # pipe's targets are the pseudo bootstrap)
    gt10 = trainer.test_pipe.case_targets("10") > 0
    idx10 = trainer.train_pipe.case_indices("10")
    bootstrap = {
        net: dice3d_np(trainer.train_pipe.labels.get(net)[idx10], gt10)
        for net in (1, 2)
    }
    label_oracle = []

    def on_refresh(epoch):
        row = {"epoch": epoch + 1}
        for net in (1, 2):
            row[f"label_dice{net}"] = round(
                dice3d_np(trainer.train_pipe.labels.get(net)[idx10], gt10), 4
            )
        label_oracle.append(row)
        print(f"# label oracle {row}", flush=True)

    trainer.on_refresh = on_refresh
    history = trainer.run(args.epochs)

    best = {
        n: max(r[f"testcase_dice{n}"] for r in history) for n in (1, 2)
    }
    # the reference's deployment rule: the checkpoint saved at the best
    # traincase-dice epoch (trainer.best_dice gate); report its test dice
    best_tc_epoch = max(history, key=lambda r: (
        r["traincase_dice1"] + r["traincase_dice2"]) / 2)
    result = {
        "config": "chaos_proposed (cases 37 GT + 10 pseudo -> test 10 GT)",
        "epochs": args.epochs,
        "train_slices": len(trainer.train_pipe),
        "bootstrap_label_dice_case10": round(bootstrap[1], 4),
        "final_case10_dice": {
            n: round(history[-1][f"testcase_dice{n}"], 4) for n in (1, 2)
        },
        "best_case10_dice": {n: round(best[n], 4) for n in (1, 2)},
        "at_checkpoint_gate": {
            n: round(best_tc_epoch[f"testcase_dice{n}"], 4) for n in (1, 2)
        },
        "gate_epoch": best_tc_epoch["epoch"],
        "label_oracle_last": label_oracle[-1] if label_oracle else None,
        "label_oracle_peak": (
            max(
                max(r["label_dice1"] for r in label_oracle),
                max(r["label_dice2"] for r in label_oracle),
            )
            if label_oracle
            else None
        ),
        "golden_reference_case10_dice_supervised1case": 0.479,
        "our_comparison_run_case10": {"final": 0.495, "best": 0.594},
        "minutes": round((time.time() - t0) / 60, 1),
    }
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({**result, "label_oracle": label_oracle,
                       "history": history}, fh, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
