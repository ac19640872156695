"""Command-line interface: ``aide-tpu {train,eval,presets} ...``.

Replaces the reference's 17 per-script argparse entry points
(``python train_files/<script>.py --model_name ... --batch_size ...``,
/root/reference/README.md:40-42) with one CLI: pick a preset (or a config
JSON), override any field with dotted key=value pairs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from aide_tpu.core.config import TrainConfig
from aide_tpu.cli.presets import PRESETS, get_preset


def _build_config(args) -> TrainConfig:
    if args.config:
        with open(args.config) as fh:
            cfg = TrainConfig.from_json(fh.read())
    elif args.preset:
        cfg = get_preset(args.preset, args.data_root)
    else:
        cfg = TrainConfig()
    if args.set:
        # --set is repeatable (action="append" + nargs="*" gives a list of
        # lists); flatten so `--set a=1 --set b=2` applies both instead of
        # silently keeping only the last flag
        flat = [kv for group in args.set for kv in group]
        cfg = cfg.override(flat)
    return cfg


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--preset", help="named preset (see `aide-tpu presets`)")
    p.add_argument("--config", help="path to a TrainConfig JSON file")
    p.add_argument("--data-root", default=".", help="directory containing the dataset folders")
    p.add_argument(
        "--set", nargs="*", action="append", default=[], metavar="KEY=VALUE",
        help="dotted config overrides, e.g. optim.lr=3e-4 data.batch_size=8 "
        "(repeatable; all occurrences apply)",
    )


def cmd_train(args) -> int:
    cfg = _build_config(args)
    from aide_tpu.engine.trainer import Trainer

    trainer = Trainer(cfg)
    epochs = args.epochs or cfg.num_epochs
    if args.profile:
        # TPU-first observability the reference lacks (SURVEY §5): trace the
        # run into a TensorBoard/xprof artifact (use --epochs 1 for a
        # readable trace of one full epoch)
        import jax

        with jax.profiler.trace(args.profile):
            trainer.run(epochs)
        print(json.dumps({"profile_dir": os.path.abspath(args.profile)}))
    else:
        trainer.run(epochs)
    return 0


def _load_checkpoint_variables(path: str, cfg: TrainConfig, template):
    """Dispatch on checkpoint format: aide_tpu ``.msgpack`` or a reference
    torch ``.pkl`` (imported torch-free via aide_tpu.interop)."""
    from aide_tpu.engine import checkpoint as ckpt_mod

    if not path.endswith(".pkl"):
        return ckpt_mod.load_net(path, template)

    import jax
    import numpy as np

    from aide_tpu.interop import import_reference_checkpoint

    variables = import_reference_checkpoint(
        path, cfg.model.name, cfg.model.learned_bilinear
    )
    # validate against the model's own init tree (catches width/norm/variant
    # mismatches with a readable message instead of an apply-time error)
    t_paths = {
        jax.tree_util.keystr(k): v.shape
        for k, v in jax.tree_util.tree_leaves_with_path(template)
    }
    i_paths = {
        jax.tree_util.keystr(k): np.shape(v)
        for k, v in jax.tree_util.tree_leaves_with_path(variables)
    }
    if t_paths != i_paths:
        missing = sorted(set(t_paths) - set(i_paths))[:4]
        extra = sorted(set(i_paths) - set(t_paths))[:4]
        shapes = [
            f"{k}: ckpt{i_paths[k]} != model{t_paths[k]}"
            for k in sorted(set(t_paths) & set(i_paths))
            if t_paths[k] != i_paths[k]
        ][:4]
        raise ValueError(
            f"imported checkpoint does not fit model {cfg.model.name!r} "
            f"(missing={missing}, extra={extra}, shape_mismatches={shapes})"
        )
    return jax.tree_util.tree_map(
        lambda t, v: np.asarray(v, dtype=np.asarray(t).dtype), template, variables
    )


def _setup_inference(cfg, checkpoint: str):
    """Shared eval/predict setup: task + test pipeline (HBM cache per the
    Trainer's device_cache policy; single jit program, so no mesh) + model
    with checkpoint weights + predict fns. Returns (task, pipe, state,
    predict, predict_all)."""
    from aide_tpu.data.pipeline import SlicePipeline
    from aide_tpu.data.tasks import build_task
    from aide_tpu.engine import steps as steps_mod
    from aide_tpu.engine.state import TrainState
    from aide_tpu.models import build_eval_model
    from aide_tpu.ops.schedules import make_optimizer
    import jax
    import jax.numpy as jnp

    task = build_task(cfg)
    specs = task.load_manifest(cfg.data.test_csv, train=False)
    pipe = SlicePipeline(
        task, specs, cfg.data.img_size, cfg.data.data_mean, cfg.data.data_std
    )
    if cfg.data.device_cache in ("on", "auto"):
        pipe.to_device()
    # inference never differentiates: the barrier-free twin keeps the
    # predict programs fully fusible (models.build_eval_model)
    model = build_eval_model(cfg.model)
    s = cfg.data.img_size
    dummy = (jnp.zeros((1, s, s, 3)),) * (2 if task.two_modal else 1)
    variables = model.init(jax.random.key(0), *dummy, train=False)
    variables = _load_checkpoint_variables(checkpoint, cfg, variables)
    state = TrainState.create(variables, make_optimizer(cfg.optim, 1, 1))
    predict = steps_mod.make_predict_step(model, task.two_modal, dual=False)
    predict_all = (
        steps_mod.make_predict_all(model, task.two_modal, dual=False)
        if pipe.device_image_data is not None
        else None
    )
    return task, pipe, state, predict, predict_all


def cmd_eval(args) -> int:
    """Offline eval: load a checkpoint, run case-wise 3D inference, emit the
    reference's CSV/PNG artifacts (evalchaos_comparison_1cases.py:143-243)."""
    cfg = _build_config(args)
    from aide_tpu.evaluation import (
        evaluate_cases,
        summarize,
        write_case_csv,
        write_case_masks,
    )

    if not args.checkpoint:
        print("error: --checkpoint is required for eval", file=sys.stderr)
        return 2
    task, pipe, state, predict, predict_all = _setup_inference(cfg, args.checkpoint)
    cases = (
        task.load_case_list(cfg.data.testcase_csv)
        if cfg.data.testcase_csv
        else list(pipe.cases)
    )
    results = evaluate_cases(
        predict, state, pipe, cases, cfg.data.eval_batch_size, dual=False,
        target_net=None, keep_largest_cc=cfg.eval.keep_largest_cc,
        full_metrics=True, keep_volumes=cfg.eval.save_png,
        predict_all=predict_all,
    )[0]

    out_dir = args.output or cfg.eval.output_dir
    name = os.path.basename(args.checkpoint).split(".")[0]
    write_case_csv(os.path.join(out_dir, f"{name}.csv"), results)
    if cfg.eval.save_png:
        for r in results:
            idxs = pipe.case_indices(r.case_id)
            names = [
                os.path.basename(pipe.specs[i].mask_path).split(".")[0]
                for i in idxs
            ]
            if len(set(names)) != len(names):  # synthetic-style paths
                names = [f"{n}_{j:03d}" for j, n in enumerate(names)]
            write_case_masks(
                os.path.join(out_dir, "generated_masks"),
                r.case_id,
                r.pred_volume,
                names,
                scale=cfg.eval.png_scale,
            )
    print(json.dumps(summarize(results), indent=2))
    return 0


def cmd_predict(args) -> int:
    """Label-free inference: run a checkpoint over a manifest (masks optional
    — e.g. the kidney image-only testing CSVs) and write predicted masks in
    the task's native convention. No metrics are computed."""
    cfg = _build_config(args)
    from aide_tpu.evaluation import infer_cases

    if not args.checkpoint:
        print("error: --checkpoint is required for predict", file=sys.stderr)
        return 2
    task, pipe, state, predict, predict_all = _setup_inference(cfg, args.checkpoint)
    out_dir = args.output or cfg.eval.output_dir
    volumes = infer_cases(
        predict, state, pipe, pipe.cases, cfg.data.eval_batch_size,
        dual=False, keep_largest_cc=cfg.eval.keep_largest_cc,
        predict_all=predict_all,
    )
    count = 0
    for case, vols in zip(pipe.cases, volumes):
        idxs = pipe.case_indices(case)
        case_specs = [pipe.specs[i] for i in idxs]
        # task-native convention: PNGs for chaos/breast/synthetic, per-image
        # .nii.gz for kidney, whole-case volume for prostate
        task.write_case_predictions(
            out_dir, case, case_specs, vols[0], png_scale=cfg.eval.png_scale
        )
        count += len(idxs)
    print(json.dumps({"cases": len(pipe.cases), "slices": count, "output": out_dir}))
    return 0


def cmd_export(args) -> int:
    """Convert an aide_tpu .msgpack checkpoint into either a
    reference-loadable torch .pkl ({'net': state_dict, ...}, so reference
    users can evaluate models trained here with their own scripts —
    evalchaos_comparison_1cases.py:154-157) or a framework-free StableHLO
    serving artifact (--format serve, aide_tpu/interop/serving.py)."""
    cfg = _build_config(args)
    from aide_tpu.engine import checkpoint as ckpt_mod
    from aide_tpu.models import build_eval_model, is_two_modal
    import jax
    import jax.numpy as jnp

    if not args.checkpoint or not args.output:
        print("error: export needs --checkpoint and --output", file=sys.stderr)
        return 2
    # exported artifacts serve forward-only: no barrier (build_eval_model)
    model = build_eval_model(cfg.model)
    s = cfg.data.img_size
    two_modal = is_two_modal(cfg.model.name)
    dummy = (jnp.zeros((1, s, s, 3)),) * (2 if two_modal else 1)
    template = model.init(jax.random.key(0), *dummy, train=False)
    variables = ckpt_mod.load_net(args.checkpoint, template)
    try:
        # checkpoint sidecar may be absent when only the .msgpack was copied
        meta = ckpt_mod.read_meta(args.checkpoint)
    except FileNotFoundError:
        meta = {}
    if getattr(args, "format", "pkl") == "serve":
        from aide_tpu.interop.serving import export_serving_artifact

        export_serving_artifact(
            args.output, model, variables, s, two_modal,
            meta={"model": cfg.model.name, "epoch": int(meta.get("epoch", 0))},
            weights_dtype=getattr(args, "weights_dtype", "float32"),
        )
    else:
        from aide_tpu.interop import export_reference_checkpoint

        # sidecar meta stores the test metrics unprefixed ('loss1'/'loss');
        # the 'test_' prefix exists only on history rows
        export_reference_checkpoint(
            args.output, variables, cfg.model.name, cfg.model.learned_bilinear,
            meta={
                "loss": float(meta.get("loss1", meta.get("loss", 0.0))),
                "epoch": int(meta.get("epoch", 0)),
            },
        )
    print(json.dumps({"output": os.path.abspath(args.output)}))
    return 0


def cmd_presets(args) -> int:
    for name in sorted(PRESETS):
        print(name)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="aide-tpu",
        description="TPU-native annotation-efficient segmentation framework",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="run a training config")
    _add_common(p_train)
    p_train.add_argument("--epochs", type=int, help="override epoch count")
    p_train.add_argument(
        "--profile", metavar="DIR",
        help="wrap the run in jax.profiler.trace and write the xprof "
             "artifact to DIR",
    )
    p_train.set_defaults(fn=cmd_train)

    p_eval = sub.add_parser("eval", help="offline case-wise evaluation")
    _add_common(p_eval)
    p_eval.add_argument("--checkpoint", help="net checkpoint (.msgpack, or a reference torch .pkl)")
    p_eval.add_argument("--output", help="output directory")
    p_eval.set_defaults(fn=cmd_eval)

    p_pred = sub.add_parser("predict", help="label-free mask inference")
    _add_common(p_pred)
    p_pred.add_argument("--checkpoint", help="net checkpoint (.msgpack, or a reference torch .pkl)")
    p_pred.add_argument("--output", help="output directory")
    p_pred.set_defaults(fn=cmd_predict)

    p_exp = sub.add_parser(
        "export",
        help="convert a .msgpack checkpoint to a reference torch .pkl or a "
             "StableHLO serving artifact",
    )
    _add_common(p_exp)
    p_exp.add_argument("--checkpoint", help="aide_tpu net checkpoint (.msgpack)")
    p_exp.add_argument("--output", help="output path")
    p_exp.add_argument(
        "--format", choices=("pkl", "serve"), default="pkl",
        help="pkl: reference torch checkpoint; serve: framework-free "
             "StableHLO function with baked-in weights (jax.export)",
    )
    p_exp.add_argument(
        "--weights-dtype", choices=("float32", "bfloat16"), default="float32",
        dest="weights_dtype",
        help="(serve only) precision of the baked-in weights; bfloat16 "
             "halves the artifact and serving weight memory",
    )
    p_exp.set_defaults(fn=cmd_export)

    p_ls = sub.add_parser("presets", help="list available presets")
    p_ls.set_defaults(fn=cmd_presets)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
