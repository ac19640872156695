"""Sweep co-teaching hyperparameters for the AIDE stage of the synthetic
ladder (experiments/synthetic_aide.py), reusing one shared pretrain
checkpoint. Each variant runs the full AIDE stage (~2-3 min on one chip)
and reports best test-case Dice + final working-label quality vs GT.

Usage: python experiments/aide_sweep.py <pretrain_ckpt> [--epochs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import synthetic_aide as SA

VARIANTS = {
    "flagship": [],
    "cons1": ["coteach.consistency_weight=1.0"],
    "warmstart": ["@resume"],
    "warmstart_cons1": ["@resume", "coteach.consistency_weight=1.0"],
    "update50": ["coteach.update_percent=0.5"],
    "sharpen": ["coteach.temperature=0.5"],
    # the shift-regime recipe applied to pseudo labels: clean-anchored
    # fine-tune instead of flagship from-scratch
    "kidney": ["@resume", "coteach.consistency_weight=1.0", "optim.lr=1e-5"],
    # post-warmup decay levers (xhard ladder: label quality improves under
    # the every-epoch warmup refreshes, decays at the interval-10 cadence
    # after — extend the improving window / keep the cadence dense)
    "warmup40": ["coteach.warmup_epochs=40"],
    "warmup60": ["coteach.warmup_epochs=60"],
    "warmup40_update50": [
        "coteach.warmup_epochs=40", "coteach.update_percent=0.5"
    ],
    "warmup40_interval2": [
        "coteach.warmup_epochs=40", "coteach.refresh_interval=2"
    ],
    "warmup40_skipempty": [
        "coteach.warmup_epochs=40", "coteach.refresh_skip_empty=true"
    ],
    # xhard sweep round 2: warmup60 won (0.7545 vs 0.7451) and its label
    # quality was still improving when warmup ended; dense post-warmup
    # refresh at full rate (warmup40_interval2) collapsed (final oracle
    # 0.15) — the improving window IS the ramp, so extend it further
    "warmup80": ["coteach.warmup_epochs=80"],
    "warmup100": ["coteach.warmup_epochs=100"],
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("pretrain_ckpt")
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--style", default="hard")
    ap.add_argument("--protocol", default="pseudo")
    ap.add_argument("--only", default="", help="comma-separated variant names")
    ap.add_argument("--workroot", default="/tmp/aide_sweep")
    ap.add_argument("--num-cases", type=int, default=SA.NUM_CASES)
    ap.add_argument("--clean-cases", type=int, default=SA.CLEAN_CASES)
    ap.add_argument("--slices-per-case", type=int, default=SA.SLICES_PER_CASE)
    ap.add_argument("--model", default=SA.MODEL)
    ap.add_argument("--img-size", type=int, default=SA.IMG_SIZE)
    ap.add_argument("--seed", type=int, default=SA.SEED)
    ap.add_argument("--out", default="", help="write results json here")
    args = ap.parse_args()

    SA.STYLE = args.style
    SA.PROTOCOL = args.protocol
    SA.NUM_CASES = args.num_cases
    SA.CLEAN_CASES = args.clean_cases
    SA.SLICES_PER_CASE = args.slices_per_case
    SA.MODEL = args.model
    SA.IMG_SIZE = args.img_size
    SA.SEED = args.seed
    names = args.only.split(",") if args.only else list(VARIANTS)

    results = {}
    for name in names:
        overrides = list(VARIANTS[name])
        resume = args.pretrain_ckpt if "@resume" in overrides else ""
        overrides = [o for o in overrides if o != "@resume"]
        SA.AIDE_OVERRIDES = overrides
        workdir = os.path.join(args.workroot, name)
        os.makedirs(workdir, exist_ok=True)
        r = SA.run(
            "aide", workdir, args.epochs,
            resume=resume, pseudo_from=args.pretrain_ckpt,
        )
        r["overrides"] = overrides + (["resume"] if resume else [])
        results[name] = r
        print(json.dumps({name: r}), flush=True)

    print(json.dumps(results, indent=2), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
