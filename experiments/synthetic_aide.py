"""AIDE-vs-baseline on synthetic noisy labels.

Reproduces the reference's qualitative claim (SURVEY §6: +0.072 Dice for the
proposed dual-net co-teaching over the supervised baseline at equal
annotation budget) on the self-contained synthetic task, mirroring the
reference's noisy-annotation regime (kidney/breast):

  * 18 train cases; 4 carry clean labels (the annotation budget), the other
    14 have corrupted (shifted) masks with probability 0.6;
  * the COMPARISON run trains a single net on that mix directly;
  * the PROPOSED run warm-starts both nets from the comparison checkpoint
    (the kidney trainers' --resumefile pattern) and applies the full AIDE
    loop — TTA pseudo-labels, small-loss exchange, consistency, worst-case
    label refresh with the clean cases exempt;
  * both are scored against CLEAN ground truth on held-out cases.

Without the clean anchor the proposed loop collapses by confirmation bias
(early refresh overwrites labels with an untrained net's predictions) — the
reference never runs it unanchored either.

Usage: python experiments/synthetic_aide.py [--epochs N] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CASES = 18
CLEAN_CASES = 4
NOISY_FRACTION = 0.6


def build_cfg(variant: str, workdir: str, epochs: int, resume: str = ""):
    from aide_tpu.core.config import TrainConfig, ModelConfig

    cfg = TrainConfig()
    cfg.model = ModelConfig(name="unet8", compute_dtype="bfloat16", norm="batch")
    cfg.data.task = "synthetic"
    cfg.data.variant = variant
    cfg.data.img_size = 64
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.data.num_tta_views = 4
    cfg.data.rotation_degree = 45.0
    cfg.data.tempmask_folder = f"tempmasks_{variant}"
    cfg.num_epochs = epochs
    cfg.coteach.warmup_epochs = max(2, epochs // 3)
    cfg.coteach.consistency_weight = 1.0
    cfg.coteach.update_percent = 0.25
    if variant == "proposed":
        # the reference's noisy-annotation trainers fine-tune at 1e-5
        # (trainkidney_proposed_mask1.py:39)
        cfg.optim.lr = 1e-5
    cfg.resume_file = resume
    cfg.checkpoint_dir = os.path.join(workdir, f"ckpt_{variant}")
    cfg.history_dir = os.path.join(workdir, f"hist_{variant}")
    return cfg


def make_task(workdir: str, variant: str):
    from aide_tpu.data.tasks.synthetic import SyntheticTask

    return SyntheticTask(
        root=os.path.join(workdir, f"data_{variant}"),
        tempmask_folder=f"tempmasks_{variant}",
        num_cases=NUM_CASES,
        slices_per_case=8,
        size=64,
        noisy_fraction=NOISY_FRACTION,
        clean_cases=CLEAN_CASES,
        seed=11,
    )


def run(variant: str, workdir: str, epochs: int, resume: str = "") -> dict:
    from aide_tpu.engine.trainer import Trainer

    task = make_task(workdir, variant)
    cfg = build_cfg(variant, workdir, epochs, resume)
    t0 = time.time()
    trainer = Trainer(cfg, task=task)
    trainer.label_cases = set(task.clean_case_ids())
    history = trainer.run(epochs)
    last = history[-1]
    best_test = max(
        max(r.get("testcase_dice1", 0.0), r.get("testcase_dice2", 0.0))
        for r in history
    )
    return {
        "variant": variant,
        "epochs": epochs,
        "final_testcase_dice": max(
            last.get("testcase_dice1", 0.0), last.get("testcase_dice2", 0.0)
        ),
        "best_testcase_dice": best_test,
        "minutes": round((time.time() - t0) / 60, 1),
        "checkpoint_dir": cfg.checkpoint_dir,
        "experiment_name": cfg.experiment_name,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--workdir", default="/tmp/aide_synth_exp2")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    results = {}
    results["comparison"] = run("comparison", args.workdir, args.epochs)
    print(json.dumps(results["comparison"]), flush=True)

    resume = os.path.join(
        results["comparison"]["checkpoint_dir"],
        f"{results['comparison']['experiment_name']}_besttraincasedice.msgpack",
    )
    results["proposed"] = run("proposed", args.workdir, args.epochs, resume)
    print(json.dumps(results["proposed"]), flush=True)

    delta = (
        results["proposed"]["best_testcase_dice"]
        - results["comparison"]["best_testcase_dice"]
    )
    summary = {
        "noisy_fraction": NOISY_FRACTION,
        "clean_cases": CLEAN_CASES,
        "num_cases": NUM_CASES,
        "comparison_best_dice": results["comparison"]["best_testcase_dice"],
        "proposed_best_dice": results["proposed"]["best_testcase_dice"],
        "aide_delta": round(delta, 4),
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"runs": results, "summary": summary}, fh, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
