"""AIDE-vs-baseline on synthetic noisy labels — 3-stage protocol.

Mirrors the reference's CHAOS ladder (SURVEY §6: pretrain 0.756 -> naive
pseudo-label training 0.799 -> AIDE 0.871):

  1. PRETRAIN: supervised on the 4 clean-labeled cases only (the annotation
     budget) — equivalent of trainchaos_comparison_1case.
  2. NAIVE: supervised on all 18 cases, 14 of which carry heavily corrupted
     masks (90% of slices shifted by up to 1/4 image) — equivalent of
     trainchaos_comparison_30cases1labeled / breast 272cases25labeled.
  3. AIDE: dual-net co-teaching warm-started from the PRETRAIN checkpoint
     (clean-anchored, not noise-memorized), TTA pseudo-labels, small-loss
     exchange, consistency, worst-case label refresh with clean cases
     exempt.

All scored against CLEAN ground truth on held-out cases. The AIDE claim is
stage 3 > stage 2 (and ideally > stage 1).

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
SLICES_PER_CASE = 8
MODEL = "unet8"
IMG_SIZE = 64
NOISY_FRACTION = 0.9
NOISE_SHIFT_DIVISOR = 4   # +-16 px shifts at 64 px: corrupted masks barely overlap GT
SEED = 11
STYLE = "ellipse"         # --style hard: star-convex shapes, low contrast,
                          # distractors — pretrain << ceiling (ROADMAP)
# Where the noisy annotations come from:
#   'shift'  — random shift+morph corruption of GT masks (the noisy-
#              annotation regime, e.g. kidney annotator errors).
#   'pseudo' — the model pretrained on the clean budget annotates every
#              unlabeled case and those predictions become the working
#              labels (the reference's limited-annotation CHAOS ladder:
#              pretrain 0.756 -> pseudo-label naive 0.799 -> AIDE 0.871,
#              examplesegmentationresults/, SURVEY §6).
#   'transfer' — the cross-domain prostate protocol: the labeled budget is
#              a fully-annotated SOURCE appearance domain, every other
#              train case and the held-out test split render in a TARGET
#              domain, and the source-pretrained model annotates the
#              target (the Prostate_split2D_crossdomain CSV analogue,
#              /root/reference/train_files/
#              trainprostate_proposed_isbi3ttransferisbidx.py:241-546).
#              Mechanically pseudo + domain_split; labeled source cases
#              stay exempt from refresh (reference :513,525).
PROTOCOL = "shift"
DOMAIN_SPLIT = "a:b"      # --direction: source:target appearance domains
# --two-modal: generate the complementary second acquisition and train the
# reference's flagship FuseUNet family on it (SURVEY §6: the CHAOS ladder
# is two-modal T1 in/out-phase + fuseunet)
TWO_MODAL = False
# lane-dense packed execution for the unet/fuseunet plain variants
# (models/packed.py) — numerically the same network, ~25-30% faster on TPU
PACKED = False
# extra dotted-key overrides applied to the AIDE stage config only (used by
# experiments/aide_sweep.py to search co-teaching hyperparameters)
AIDE_OVERRIDES: list = []


def build_cfg(stage: str, workdir: str, epochs: int, resume: str = ""):
    from aide_tpu.core.config import TrainConfig, ModelConfig

    cfg = TrainConfig()
    cfg.model = ModelConfig(
        name=MODEL, compute_dtype="bfloat16", norm="batch", packed=PACKED
    )
    cfg.data.task = "synthetic"
    cfg.data.variant = "proposed" if stage == "aide" else "comparison"
    cfg.data.img_size = IMG_SIZE
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.data.num_tta_views = 4
    cfg.data.rotation_degree = 45.0
    cfg.data.tempmask_folder = f"tempmasks_{stage}"
    cfg.num_epochs = epochs
    if PROTOCOL in ("pseudo", "transfer"):
        # mirror the flagship trainchaos_proposed defaults: fresh dual nets
        # (resume stays empty — random init IS the co-teaching asymmetry),
        # lr 1e-4, consistency weight 10, 20 warmup epochs
        cfg.coteach.warmup_epochs = min(20, max(2, epochs // 3))
    else:
        cfg.coteach.warmup_epochs = max(2, epochs // 3)
        cfg.coteach.consistency_weight = 1.0
        cfg.coteach.update_percent = 0.25
        if stage == "aide":
            # the noisy-annotation regime fine-tunes from the clean anchor
            # at 1e-5 (trainkidney_proposed_mask1.py:39)
            cfg.optim.lr = 1e-5
    cfg.resume_file = resume
    cfg.checkpoint_dir = os.path.join(workdir, f"ckpt_{stage}")
    cfg.history_dir = os.path.join(workdir, f"hist_{stage}")
    if stage == "aide" and AIDE_OVERRIDES:
        cfg = cfg.override(AIDE_OVERRIDES)
    return cfg


def make_task(workdir: str, stage: str, num_cases: int):
    """Cases are generated per (case, slice, seed), so the clean cases 0-3
    are identical across stages regardless of num_cases."""
    from aide_tpu.data.tasks.synthetic import SyntheticTask

    return SyntheticTask(
        root=os.path.join(workdir, f"data_{stage}"),
        tempmask_folder=f"tempmasks_{stage}",
        two_modal=TWO_MODAL,
        num_cases=num_cases,
        slices_per_case=SLICES_PER_CASE,
        size=IMG_SIZE,
        # pseudo/transfer protocols: unlabeled cases start with GT that is
        # then OVERWRITTEN by pretrain-model predictions
        # (apply_pseudo_labels); no artificial corruption
        noisy_fraction=(
            0.0 if PROTOCOL in ("pseudo", "transfer") else NOISY_FRACTION
        ),
        clean_cases=CLEAN_CASES,
        noise_shift_divisor=NOISE_SHIFT_DIVISOR,
        style=STYLE,
        seed=SEED,
        domain_split=DOMAIN_SPLIT if PROTOCOL == "transfer" else "",
        test_case_offset=100,   # held-out anatomy, clean labels
        num_test_cases=8,
    )


def apply_pseudo_labels(trainer, pretrain_ckpt: str) -> float:
    """The reference's limited-annotation protocol: the model pretrained on
    the labeled budget annotates every unlabeled case, and those predictions
    become the labels the next stage trains on (the golden
    fuseunet_chaoscomparison30cases1labeled config is exactly this
    pseudo-label pretrain; AIDE then refines the same labels)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aide_tpu.engine import checkpoint as ckpt_mod
    from aide_tpu.engine import steps as steps_mod
    from aide_tpu.engine.state import TrainState
    from aide_tpu.evaluation.case_eval import infer_cases
    from aide_tpu.ops.schedules import make_optimizer

    pipe = trainer.train_pipe
    s = trainer.cfg.data.img_size
    dummy = (jnp.zeros((1, s, s, 3)),) * (2 if trainer.two_modal else 1)
    template = trainer.model.init(jax.random.key(0), *dummy, train=False)
    variables = ckpt_mod.load_net(pretrain_ckpt, template)
    state = TrainState.create(variables, make_optimizer(trainer.cfg.optim, 1, 1))
    predict = steps_mod.make_predict_step(trainer.model, trainer.two_modal, dual=False)

    cases = [c for c in pipe.cases if c not in trainer.label_cases]
    volumes = infer_cases(
        predict, state, pipe, cases, trainer.cfg.data.eval_batch_size, dual=False
    )
    from aide_tpu.evaluation import dice3d_np

    qs = []
    for case, vols in zip(cases, volumes):
        idxs = pipe.case_indices(case)
        vol = vols[0].astype(np.uint8)
        # pipe.targets are still GT at this point (pseudo protocol)
        qs.append(dice3d_np(vol, pipe.targets[idxs]))
        if trainer.dual:
            # initial working labels for both co-teaching nets
            for net in (1, 2):
                pipe.labels.refresh_case(net, idxs, vol)
        else:
            # the supervised naive stage trains directly on pseudo-GT
            pipe.targets[idxs] = vol
    # push the rewritten labels into the device-resident cache
    if pipe._device_data is not None:
        if trainer.dual:
            pipe.sync_labels_to_device()
        else:
            # re-upload with the trainer's mesh so the device cache keeps
            # its sharding policy (a bare to_device() would fall back to a
            # single-default-device gather under a multi-device mesh)
            pipe.to_device(trainer.mesh, trainer.cfg.mesh.data_axis)
    quality = float(np.mean(qs))
    print(
        json.dumps({"pseudo_label_quality": round(quality, 4)}),
        flush=True,
    )
    return quality


def eval_ckpt_on_domain(ckpt_path: str, workdir: str, domain: str) -> float:
    """Held-out eval of a single-net checkpoint with the test anatomy
    rendered in ``domain`` — reports the pretrain's WITHIN-source skill next
    to its cross-domain number, quantifying the domain gap the way the
    reference's singledomain-vs-transfer comparison configs do
    (trainprostate_comparison_*singledomain vs *transfer*)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aide_tpu.data.pipeline import SlicePipeline
    from aide_tpu.engine import checkpoint as ckpt_mod
    from aide_tpu.engine import steps as steps_mod
    from aide_tpu.engine.state import TrainState
    from aide_tpu.evaluation.case_eval import evaluate_cases
    from aide_tpu.models import build_model
    from aide_tpu.ops.schedules import make_optimizer

    cfg = build_cfg(f"domval_{domain}", workdir, 1)
    task = make_task(workdir, f"domval_{domain}", CLEAN_CASES)
    task.domain_split = f"{domain}:{domain}"  # test split renders `domain`
    specs = task.load_manifest(train=False)
    pipe = SlicePipeline(
        task, specs, cfg.data.img_size, cfg.data.data_mean,
        cfg.data.data_std, working_labels=False,
    )
    s = cfg.data.img_size
    model = build_model(cfg.model)
    dummy = (jnp.zeros((1, s, s, 3)),) * (2 if TWO_MODAL else 1)
    template = model.init(jax.random.key(0), *dummy, train=False)
    variables = ckpt_mod.load_net(ckpt_path, template)
    state = TrainState.create(variables, make_optimizer(cfg.optim, 1, 1))
    predict = steps_mod.make_predict_step(model, TWO_MODAL, dual=False)
    results = evaluate_cases(
        predict, state, pipe, list(pipe.cases),
        cfg.data.eval_batch_size, dual=False,
    )
    return round(float(np.mean([r.dice for r in results[0]])), 4)


def clean_gt(trainer) -> "np.ndarray":
    """Clean ground-truth masks for every train slice, whatever the
    protocol. Under pseudo, pipe.targets ARE the clean GT; under shift they
    hold the CORRUPTED annotations, so a clone generator with
    noisy_fraction=0 (same seed/style — the mask is drawn before the
    corruption decision) regenerates the clean masks once and caches them
    on the trainer."""
    import numpy as np

    cached = getattr(trainer, "_clean_gt", None)
    if cached is not None:
        return cached
    pipe = trainer.train_pipe
    if PROTOCOL in ("pseudo", "transfer"):
        gt = pipe.targets
    else:
        from aide_tpu.data.tasks.base import resize_mask
        from aide_tpu.data.tasks.synthetic import SyntheticTask

        t = trainer.task
        clone = SyntheticTask(
            root=t.root, two_modal=t.two_modal, num_cases=t.num_cases,
            slices_per_case=t.slices_per_case, size=t.size,
            noisy_fraction=0.0, clean_cases=t.clean_cases,
            noise_shift_divisor=t.noise_shift_divisor, style=t.style,
            seed=t.seed, test_case_offset=t.test_case_offset,
            num_test_cases=t.num_test_cases, domain_split=t.domain_split,
        )
        gt = np.zeros_like(pipe.targets)
        for i, spec in enumerate(pipe.specs):
            _, mask = clone.decode(spec)
            if mask.shape != gt.shape[1:]:
                mask = resize_mask(mask, gt.shape[1:])
            gt[i] = (mask > 0).astype(gt.dtype)
    trainer._clean_gt = gt
    return gt


def label_quality(trainer) -> float:
    """Mean Dice of the working labels vs clean GT over non-clean cases
    (both nets) — the oracle for whether refresh helps or hurts."""
    import numpy as np

    from aide_tpu.evaluation import dice3d_np

    pipe = trainer.train_pipe
    gt = clean_gt(trainer)
    qs = []
    for case in pipe.cases:
        if case in trainer.label_cases:
            continue
        idxs = pipe.case_indices(case)
        for net in (1, 2):
            qs.append(dice3d_np(pipe.labels.get(net)[idxs], gt[idxs]))
    return round(float(np.mean(qs)), 4)


def run(
    stage: str, workdir: str, epochs: int, resume: str = "", pseudo_from: str = ""
) -> dict:
    from aide_tpu.engine.trainer import Trainer

    num_cases = CLEAN_CASES if stage == "pretrain" else NUM_CASES
    task = make_task(workdir, stage, num_cases)
    if stage == "ceiling":
        # supervised on clean GT of every case: the oracle ceiling that
        # bounds what any label-refinement scheme can reach. Regime gate:
        # the pseudo protocol only engages when ceiling - naive is large.
        task.noisy_fraction = 0.0
    cfg = build_cfg(stage, workdir, epochs, resume)
    t0 = time.time()
    trainer = Trainer(cfg, task=task)
    trainer.label_cases = set(task.clean_case_ids())
    if pseudo_from and PROTOCOL in ("pseudo", "transfer"):
        q0 = apply_pseudo_labels(trainer, pseudo_from)
        if trainer.dual:
            # feed the measured bootstrap quality to the guardrail (the
            # real-workflow analogue: the practitioner scores the source
            # model on a couple of labeled target validation cases before
            # committing to the refresh run) — drives the end-of-ramp
            # cliff/transition/clear verdict
            trainer.engagement_probe = {
                "bootstrap_skill1": q0, "bootstrap_skill2": q0,
            }
    if trainer.dual:
        # per-refresh label-quality oracle: the working labels must IMPROVE
        # across refreshes for the regime to be healthy (VERDICT r2 #2)
        quality_track = []

        def on_refresh(epoch):
            q = label_quality(trainer)
            quality_track.append({"epoch": epoch + 1, "label_quality": q})
            print(json.dumps(quality_track[-1]), flush=True)

        trainer.on_refresh = on_refresh
    # evaluate on held-out cases from an independent generator segment
    history = trainer.run(epochs)
    last = history[-1]
    best_test = max(
        max(r.get("testcase_dice1", 0.0), r.get("testcase_dice2", 0.0))
        for r in history
    )
    quality = label_quality(trainer) if trainer.dual else None
    return {
        **({"final_label_quality": quality} if quality is not None else {}),
        **({"label_quality_track": quality_track} if trainer.dual else {}),
        # the run-time (oracle-free) engagement verdict at the end of the
        # warmup ramp — calibration data for the abstain guardrail
        **(
            {"engagement": trainer.engagement}
            if trainer.dual and trainer.engagement is not None
            else {}
        ),
        **(
            {"engagement_probe": trainer.engagement_probe}
            if trainer.dual and trainer.engagement_probe is not None
            else {}
        ),
        **(
            {"crossnet_dice_track": [
                {"epoch": r["epoch"], "crossnet_dice": round(r["crossnet_dice"], 4)}
                for r in history if "crossnet_dice" in r
            ]}
            if trainer.dual
            else {}
        ),
        "stage": stage,
        "epochs": epochs,
        "final_testcase_dice": max(
            last.get("testcase_dice1", 0.0), last.get("testcase_dice2", 0.0)
        ),
        "best_testcase_dice": best_test,
        "minutes": round((time.time() - t0) / 60, 1),
        "checkpoint": os.path.join(
            cfg.checkpoint_dir,
            f"{cfg.experiment_name}"
            + ("_net1" if stage == "aide" else "")
            + "_besttraincasedice.msgpack",
        ),
    }


def main() -> int:
    global STYLE, CLEAN_CASES, NOISE_SHIFT_DIVISOR, PROTOCOL
    global NUM_CASES, SLICES_PER_CASE, MODEL, SEED, IMG_SIZE, TWO_MODAL
    global PACKED
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    # the pretrain stage sees only 4 cases (32 slices, 4 steps/epoch) and
    # needs many epochs to converge, like the reference's 100-epoch pretrain
    ap.add_argument("--pretrain-epochs", type=int, default=60)
    ap.add_argument("--workdir", default="/tmp/aide_synth_exp")
    ap.add_argument("--out", default="")
    ap.add_argument("--style", default="ellipse", choices=("ellipse", "hard", "xhard"))
    ap.add_argument("--protocol", default="shift",
                    choices=("shift", "pseudo", "transfer"))
    ap.add_argument("--direction", default="a:b",
                    help="transfer protocol source:target appearance "
                         "domains (a:b or b:a)")
    ap.add_argument("--num-cases", type=int, default=NUM_CASES)
    ap.add_argument("--slices-per-case", type=int, default=SLICES_PER_CASE)
    ap.add_argument("--model", default=MODEL)
    ap.add_argument("--img-size", type=int, default=IMG_SIZE)
    ap.add_argument("--ceiling", action="store_true",
                    help="also run the supervised-on-clean-GT oracle stage")
    ap.add_argument("--seed", type=int, default=SEED,
                    help="synthetic data generator seed (case anatomy)")
    ap.add_argument("--clean-cases", type=int, default=CLEAN_CASES)
    ap.add_argument("--shift-divisor", type=int, default=NOISE_SHIFT_DIVISOR)
    ap.add_argument("--packed", action="store_true",
                    help="lane-dense packed execution (models/packed.py)")
    ap.add_argument("--two-modal", action="store_true",
                    help="complementary second acquisition + fuseunet-family "
                         "models (the reference's flagship CHAOS setup)")
    ap.add_argument("--aide-override", action="append", default=[],
                    help="dotted config override applied to the AIDE stage "
                         "only (repeatable), e.g. coteach.warmup_epochs=60")
    args = ap.parse_args()

    STYLE = args.style
    PROTOCOL = args.protocol
    global DOMAIN_SPLIT
    DOMAIN_SPLIT = args.direction
    IMG_SIZE = args.img_size
    NUM_CASES = args.num_cases
    SLICES_PER_CASE = args.slices_per_case
    MODEL = args.model
    SEED = args.seed
    CLEAN_CASES = args.clean_cases
    NOISE_SHIFT_DIVISOR = args.shift_divisor
    TWO_MODAL = args.two_modal
    PACKED = args.packed
    global AIDE_OVERRIDES
    AIDE_OVERRIDES = list(args.aide_override)

    os.makedirs(args.workdir, exist_ok=True)
    results = {}
    if args.ceiling:
        results["ceiling"] = run("ceiling", args.workdir, args.epochs)
        print(json.dumps(results["ceiling"]), flush=True)
    results["pretrain"] = run("pretrain", args.workdir, args.pretrain_epochs)
    print(json.dumps(results["pretrain"]), flush=True)

    if PROTOCOL == "transfer":
        # the domain gap, quantified: the same checkpoint on held-out
        # anatomy rendered in the SOURCE domain (its training distribution)
        src = DOMAIN_SPLIT.split(":")[0]
        results["pretrain"]["source_domain_dice"] = eval_ckpt_on_domain(
            results["pretrain"]["checkpoint"], args.workdir, src
        )
        print(
            json.dumps(
                {"pretrain_source_domain_dice":
                 results["pretrain"]["source_domain_dice"]}
            ),
            flush=True,
        )

    results["naive"] = run(
        "naive", args.workdir, args.epochs,
        pseudo_from=results["pretrain"]["checkpoint"],
    )
    print(json.dumps(results["naive"]), flush=True)

    results["aide"] = run(
        "aide", args.workdir, args.epochs,
        # shift regime: clean-anchored warm start (kidney protocol).
        # pseudo/transfer regimes: fresh dual nets like the CHAOS/prostate
        # flagships — random init is the co-teaching asymmetry; warm-
        # starting both nets from one checkpoint collapses into
        # self-confirmation.
        resume=(
            ""
            if PROTOCOL in ("pseudo", "transfer")
            else results["pretrain"]["checkpoint"]
        ),
        pseudo_from=results["pretrain"]["checkpoint"],
    )
    print(json.dumps(results["aide"]), flush=True)

    summary = {
        "style": STYLE,
        "protocol": PROTOCOL,
        **({"direction": DOMAIN_SPLIT} if PROTOCOL == "transfer" else {}),
        "seed": SEED,
        "model": MODEL,
        "two_modal": TWO_MODAL,
        "slices_per_case": SLICES_PER_CASE,
        # effective value: pseudo/transfer protocols apply no corruption
        "noisy_fraction": (
            0.0 if PROTOCOL in ("pseudo", "transfer") else NOISY_FRACTION
        ),
        "noise_shift_divisor": NOISE_SHIFT_DIVISOR,
        "clean_cases": CLEAN_CASES,
        "num_cases": NUM_CASES,
        **({"ceiling_best_dice": results["ceiling"]["best_testcase_dice"]}
           if "ceiling" in results else {}),
        "img_size": IMG_SIZE,
        **(
            {"pretrain_source_dice":
             results["pretrain"].get("source_domain_dice")}
            if PROTOCOL == "transfer" else {}
        ),
        "pretrain_best_dice": results["pretrain"]["best_testcase_dice"],
        "naive_best_dice": results["naive"]["best_testcase_dice"],
        "aide_best_dice": results["aide"]["best_testcase_dice"],
        "aide_over_naive": round(
            results["aide"]["best_testcase_dice"]
            - results["naive"]["best_testcase_dice"],
            4,
        ),
        "aide_over_pretrain": round(
            results["aide"]["best_testcase_dice"]
            - results["pretrain"]["best_testcase_dice"],
            4,
        ),
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"runs": results, "summary": summary}, fh, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
