"""Benchmark: FULL CHAOS co-teaching epoch time on TPU vs the reference.

The reference reports ~420 s/epoch for the flagship CHAOS proposed config —
dual FuseUNet co-teaching, 984 training slices, batch 4, 4 TTA views,
256x256 (/root/reference/README.md:45; SURVEY §6) — and that 420 s includes
everything its epoch loop does (trainchaos_proposed_30cases1labeled.py:
245-590): train steps, test-batch eval, per-case 3D test eval, per-case
train re-inference for BOTH nets, checkpointing, and the label refresh.

This benchmark runs OUR engine's complete `Trainer.run_epoch` at the same
operating point (30 train cases / 984 slices, 10 test cases / 300 slices,
256x256 two-modal, 4 TTA views) on a size-matched synthetic dataset and
reports the honest wall-clock per epoch. The jitted-train-step-only number
(what bench reported in round 1) and the step throughput in TFLOP/s / MFU
are secondary fields.

Every jitted program is compiled exactly once (remote compiles on the
tunneled chip cost minutes and the persistent cache does not cover them):
the warmup epoch compiles everything, the FLOPs query reuses the in-process
executable, and the step-only timing reuses the trainer's own train step.

Prints ONE JSON line:
  {"metric": "chaos_coteach_epoch_seconds", "value": <s>, "unit": "s/epoch",
   "vs_baseline": <420 / value>, ...}

Usage: python bench.py [--batch N] [--steps-only] [--profile DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

EPOCH_SLICES = 984      # CHAOS proposed train set (README.md:45)
BASELINE_EPOCH_S = 420.0
# the reference's supervised comparison config at the same operating point
# (single fuseunet, no TTA/coteach) runs ~300 s/epoch (README.md:45)
SUPERVISED_BASELINE_S = 300.0
# bf16 peak of one v5e chip (MXU); MFU is measured against this
PEAK_TFLOPS = 197.0
# the reference quotes "several seconds" per 3D volume for its eval scripts
# (/root/reference/README.md:46, bs=1 slice loop + CPU scipy CC); 3.0 s is
# the charitable LOW end of "several", used as the nominal vs_baseline
EVAL_VOLUME_BASELINE_S = 3.0


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


# non-CHAOS operating points (VERDICT r2 #7): kidney trainers run a
# single-modal UNet at 512 px (trainkidney_proposed_mask1.py), breast at
# 384 px (trainbreast_dataset3_proposed_272cases25labeled.py). The
# reference publishes no epoch times for them, so vs_baseline is reported
# against the CHAOS proposed 420 s for scale only.
TASK_POINTS = {
    "chaos": dict(model="fuseunet", img=256, two_modal=True,
                  cases=30, slices=33, test_cases=10),
    "kidney": dict(model="unet", img=512, two_modal=False,
                   cases=24, slices=10, test_cases=6),
    "breast": dict(model="unet", img=384, two_modal=False,
                   cases=60, slices=5, test_cases=10),
    # prostate trainers run the single-modal UNet at 256 px
    # (trainprostate_proposed_isbi3ttransferisbidx.py:42 --img_size 256)
    "prostate": dict(model="unet", img=256, two_modal=False,
                     cases=30, slices=15, test_cases=10),
}


def make_config(batch: int, variant: str = "proposed", task: str = "chaos",
                eval_batch: int = 0, block_barrier: bool = True):
    from aide_tpu.core.config import ModelConfig, TrainConfig

    pt = TASK_POINTS[task]
    cfg = TrainConfig()
    cfg.model = ModelConfig(name=pt["model"], compute_dtype="bfloat16")
    # lane-dense packed execution of the narrow full-resolution stages
    # (models/packed.py) — numerically identical, measured faster
    cfg.model.packed = True
    # A/B knob: cost of the packed-block optimization_barrier NaN
    # workaround (ModelConfig.packed_block_barrier)
    cfg.model.packed_block_barrier = block_barrier
    cfg.data.task = "synthetic"
    cfg.data.variant = variant
    cfg.data.img_size = pt["img"]
    cfg.data.batch_size = batch
    # big eval batches: fewer dispatches over the tunneled link during the
    # per-case re-inference passes (each dispatch costs tens of ms)
    cfg.data.eval_batch_size = eval_batch or max(batch, 32)
    cfg.data.num_tta_views = 4
    cfg.data.rotation_degree = 60.0
    cfg.coteach.warmup_epochs = 20
    cfg.num_epochs = 100
    cfg.checkpoint_dir = "/tmp/aide_bench_ckpt"
    cfg.history_dir = "/tmp/aide_bench_hist"
    cfg.data.tempmask_folder = "tempmasks"
    # decoded-array cache survives across bench runs (generating 1290
    # 256px synthetic slices costs ~2-3 min on the 1-core host)
    cfg.data.decode_cache_dir = "/tmp/aide_bench_decode_cache"
    return cfg


def build_trainer(cfg, task_name: str = "chaos"):
    from aide_tpu.data.tasks.synthetic import SyntheticTask
    from aide_tpu.engine.trainer import Trainer

    # CHAOS flagship operating point: 30 train cases x ~33 slices = 990
    # (984 in the reference), 10 test cases x 30 slices = 300, one labeled
    # (clean) case, noisy working labels elsewhere. kidney/breast points
    # use their presets' resolutions/models (TASK_POINTS).
    pt = TASK_POINTS[task_name]
    task = SyntheticTask(
        root="/tmp/aide_bench_data",
        tempmask_folder=cfg.data.tempmask_folder,
        two_modal=pt["two_modal"],
        num_cases=pt["cases"],
        slices_per_case=pt["slices"],
        size=cfg.data.img_size,
        noisy_fraction=0.5,
        clean_cases=1,
        num_test_cases=pt["test_cases"],
        test_case_offset=100,
        seed=7,
    )
    trainer = Trainer(cfg, task=task)
    trainer.label_cases = set(task.clean_case_ids())
    return trainer


def time_bare_steps(trainer, cfg, iters=16):
    """Step-only metric reusing the trainer's already-compiled train step."""
    # shard exactly like the epoch loop does — a differently-committed
    # sharding would recompile the step
    batch = trainer._shard(
        trainer.train_pipe.batch_at(np.arange(cfg.data.batch_size))
    )
    # strong float32 to match the epoch loop's jnp.asarray(rate, float32) —
    # a weak-typed scalar is a different jit signature and would recompile
    # the whole dual-net step (1-2 min remote compile)
    rate = jnp.asarray(0.5, jnp.float32)
    key = jax.random.key(123)
    state = trainer.state  # donated per call; thread it through

    if trainer.dual:
        step_args = lambda i: (batch, jax.random.fold_in(key, i), rate)
        loss_key = "loss1"
    else:
        step_args = lambda i: (batch,)
        loss_key = "loss"

    # sync (value fetch — block_until_ready returns early on the tunnel);
    # fold_in data must be non-negative (uint32), so the warmup call uses
    # an index far outside the timed range
    state, m = trainer.train_step(state, *step_args(1_000_000))
    float(m[loss_key])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = trainer.train_step(state, *step_args(i))
    float(m[loss_key])
    dt = (time.perf_counter() - t0) / iters
    trainer.state = state

    # executed FLOPs: in-process cache hit (the step is already compiled)
    try:
        an = (
            trainer.train_step.lower(state, *step_args(0))
            .compile()
            .cost_analysis()
        )
        if isinstance(an, list):
            an = an[0]
        flops = float(an.get("flops", 0.0))
    except Exception:  # noqa: BLE001
        flops = 0.0

    # model FLOPs: the algorithmic work of the PLAIN (unpacked) network.
    # The packed space-to-depth convs execute structural zeros, so the
    # compiled analysis above overstates useful work; honest MFU divides by
    # what the plain model would compute. Lowering (no compile — a remote
    # compile costs minutes) the unpacked twin of the same step gives the
    # frontend HLO flop count; convs/dots dominate and their frontend count
    # equals the algorithmic one. The tunneled backend's
    # Lowered.cost_analysis() returns None, so fall back to a CPU
    # subprocess probe (--plain-flops-probe) on abstract shapes.
    model_flops = flops
    if cfg.model.packed:
        pan = None
        try:
            import dataclasses

            from aide_tpu.engine import steps as steps_mod
            from aide_tpu.models import build_model

            plain_cfg = dataclasses.replace(cfg)
            plain_cfg.model = dataclasses.replace(cfg.model, packed=False)
            plain_model = build_model(plain_cfg.model)
            if trainer.dual:
                plain_step = steps_mod.make_coteach_train_step(
                    plain_model, trainer.two_modal, plain_cfg
                )
            else:
                plain_step = steps_mod.make_supervised_train_step(
                    plain_model, trainer.two_modal, plain_cfg
                )
            pan = plain_step.lower(state, *step_args(0)).cost_analysis()
            if isinstance(pan, list):
                pan = pan[0]
        except Exception as e:  # noqa: BLE001
            log(f"in-process plain-model flops analysis failed ({e})")
        if isinstance(pan, dict) and pan.get("flops"):
            model_flops = float(pan["flops"])
        else:
            probed = _plain_flops_subprocess(trainer, cfg)
            if probed:
                model_flops = probed
            else:
                log("plain-model flops unavailable; "
                    "falling back to executed flops")
                model_flops = 0.0  # signal the fallback to the caller
    return dt, flops, model_flops


def _plain_flops_subprocess(trainer, cfg) -> float:
    """Run --plain-flops-probe under JAX_PLATFORMS=cpu and parse its one
    JSON line. The probe lowers on abstract shapes only (eval_shape init +
    ShapeDtypeStruct batch) — seconds of host work, no device."""
    import os
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # skip the machine profile's sitecustomize, which pins the axon backend
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    cmd = [
        sys.executable, os.path.abspath(__file__), "--plain-flops-probe",
        "--batch", str(cfg.data.batch_size),
        "--task", getattr(trainer, "_bench_task", "chaos"),
    ]
    if not trainer.dual:
        cmd.append("--supervised")
    try:
        out = subprocess.run(
            cmd, capture_output=True, timeout=600, env=env, text=True
        )
        line = out.stdout.strip().splitlines()[-1]
        return float(json.loads(line)["plain_flops"])
    except Exception as e:  # noqa: BLE001
        log(f"plain-flops subprocess probe failed ({e})")
        return 0.0


def plain_flops_probe(args) -> int:
    """--plain-flops-probe: print the frontend HLO flop count of the PLAIN
    (unpacked) train step at the given operating point. Runs on the CPU
    platform with abstract shapes — no data, no compile, no device. The
    probe batch carries float32 images (the real epoch ships uint8 +
    on-device normalization), slightly UNDER-counting model flops by the
    per-pixel affine — conservative for MFU."""
    import jax
    import jax.numpy as jnp

    from aide_tpu.engine import steps as steps_mod
    from aide_tpu.engine.state import DualTrainState, TrainState
    from aide_tpu.models import build_model
    from aide_tpu.ops.schedules import make_optimizer

    variant = "comparison" if args.supervised else "proposed"
    cfg = make_config(args.batch, variant, args.task)
    cfg.model.packed = False
    pt = TASK_POINTS[args.task]
    size, batch, two = pt["img"], args.batch, pt["two_modal"]
    model = build_model(cfg.model)
    x = jnp.zeros((1, size, size, 3))
    imgs = (x, x) if two else (x,)

    def make_state():
        tx = make_optimizer(cfg.optim, 123, cfg.num_epochs)
        if variant == "proposed":
            v1 = model.init(jax.random.key(0), *imgs, train=False)
            v2 = model.init(jax.random.key(1), *imgs, train=False)
            return DualTrainState.create(v1, v2, tx)
        v = model.init(jax.random.key(0), *imgs, train=False)
        return TrainState.create(v, tx)

    state = jax.eval_shape(make_state)
    f32 = jnp.float32
    img = jax.ShapeDtypeStruct((batch, size, size, 3), f32)
    fill = jax.ShapeDtypeStruct((batch, 3), f32)
    tgt = jax.ShapeDtypeStruct((batch, size, size), jnp.int32)
    if two:
        batch_d = {"modal1": img, "modal2": img, "fill1": fill, "fill2": fill}
    else:
        batch_d = {"image": img, "fill": fill}
    if variant == "proposed":
        batch_d.update(target1=tgt, target2=tgt)
        step = steps_mod.make_coteach_train_step(model, two, cfg)
        lowered = step.lower(
            state, batch_d, jax.random.key(0), jnp.asarray(0.5, f32)
        )
    else:
        batch_d.update(target=tgt)
        step = steps_mod.make_supervised_train_step(model, two, cfg)
        lowered = step.lower(state, batch_d)
    an = lowered.cost_analysis()
    if isinstance(an, list):
        an = an[0]
    print(json.dumps({"plain_flops": float(an.get("flops", 0.0))}))
    return 0


def eval_volume_bench(trainer, cfg, args) -> int:
    """Per-volume 3D evaluation speed — the BASELINE.md row the epoch bench
    does not isolate. One "volume eval" = batched slice inference through
    the jitted predict program, the bit-packed device->host fetch,
    keep-largest-CC, and 3D Dice/IoU/confusion on host — the same work as
    one case of the reference's eval scripts
    (evalchaos_comparison_1cases.py:143-243), which it runs as a bs=1
    slice loop at "several seconds" per volume (README.md:46).

    Two numbers: single-volume LATENCY (one volume alone — pays the full
    ~0.25 s tunnel round trip; the serving-relevant figure) and batch-
    amortized throughput (all test volumes in ONE lax.map program / one
    fetch, the in-training path; seconds per volume)."""
    from aide_tpu.evaluation.case_eval import evaluate_cases

    cases = list(trainer.test_cases)
    eb = cfg.data.eval_batch_size
    pipe = trainer.test_pipe

    def run(case_list):
        return evaluate_cases(
            trainer.predict_step, trainer.state, pipe, case_list, eb,
            trainer.dual, keep_largest_cc=True, full_metrics=True,
            predict_all=trainer.predict_all,
        )

    log("compiling predict programs (single-volume + full-set shapes)...")
    run(cases[:1])
    run(cases)
    log("timing single-volume latency...")
    lat = []
    for _ in range(2):
        for c in cases:
            t0 = time.perf_counter()
            run([c])
            lat.append(time.perf_counter() - t0)
    log("timing batch-amortized throughput (all volumes, one program)...")
    thr = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(cases)
        thr.append(time.perf_counter() - t0)
    lat_med = float(np.median(lat))
    amortized = float(np.median(thr)) / len(cases)
    print(json.dumps({
        "metric": f"{args.task}_eval_volume_seconds",
        "value": round(lat_med, 3),
        "unit": "s/volume",
        "vs_baseline": round(EVAL_VOLUME_BASELINE_S / lat_med, 2),
        "task": args.task,
        # dual co-teach states evaluate BOTH nets per volume; --supervised
        # matches the reference eval script's single net
        "nets_evaluated": 2 if trainer.dual else 1,
        "slices_per_volume": len(pipe.case_indices(cases[0])),
        "img_size": cfg.data.img_size,
        "volumes_timed": len(cases),
        "amortized_volume_seconds": round(amortized, 3),
        "includes": "batched slice inference + bit-packed fetch + "
                    "largest-CC + 3D dice/iou/confusion (host)",
        "baseline_note": "reference README.md:46: 'several seconds' per "
                         "volume; vs_baseline uses 3.0 s",
    }))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval-batch", type=int, default=0,
                    help="eval/predict batch size (0 = max(batch, 32))")
    ap.add_argument("--task", default="chaos", choices=sorted(TASK_POINTS),
                    help="operating point (model/resolution/dataset size)")
    ap.add_argument("--supervised", action="store_true",
                    help="benchmark the supervised comparison config "
                         "(single net, no TTA/coteach; reference ~300 s)")
    ap.add_argument("--eval-volume", action="store_true",
                    help="benchmark per-volume 3D eval speed (inference + "
                         "CC + metrics; reference: 'several seconds' per "
                         "volume, README.md:46). Combine with --supervised "
                         "for the single-net eval-script analogue.")
    ap.add_argument("--steps-only", action="store_true",
                    help="report the step-extrapolated metric only (skip "
                         "the timed full epoch)")
    ap.add_argument("--block-barrier", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="ModelConfig.packed_block_barrier (the packed-block "
                         "NaN workaround; measured +1.2%% step time). "
                         "--no-block-barrier for the unfenced A/B point.")
    ap.add_argument("--profile", metavar="DIR",
                    help="wrap the timed epoch in jax.profiler.trace")
    ap.add_argument("--plain-flops-probe", action="store_true",
                    help="print the unpacked model's frontend flop count "
                         "and exit (run under JAX_PLATFORMS=cpu)")
    args = ap.parse_args()

    if args.plain_flops_probe:
        return plain_flops_probe(args)

    import shutil
    import signal

    # A cold run is dominated by remote compiles (~10 min). If a driver
    # timeout SIGTERMs us after the step measurement but before the timed
    # full epoch, flush the step-extrapolated result instead of nothing
    # (marked "partial": "steps_only").
    partial = {}

    def _flush_partial(signum, frame):
        if partial:
            print(json.dumps(partial), flush=True)
        sys.exit(0)

    signal.signal(signal.SIGTERM, _flush_partial)

    shutil.rmtree("/tmp/aide_bench_data", ignore_errors=True)
    shutil.rmtree("/tmp/aide_bench_ckpt", ignore_errors=True)

    # the tunneled TPU backend drops for minutes at a time (observed hours);
    # retry initialization with backoff instead of failing the whole bench
    # on a transient outage. Each failed attempt leaves the backend cached
    # as failed, so probe in a subprocess and only then touch jax here.
    import subprocess

    for attempt in range(8):
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True,
                timeout=180,
            )
            if probe.returncode == 0:
                break
        except subprocess.TimeoutExpired:
            pass  # init hangs when the tunnel is down
        log(f"TPU backend unavailable (attempt {attempt + 1}/8); "
            "retrying in 60 s...")
        time.sleep(60)
    else:
        log("TPU backend unreachable after 8 attempts")
        print(json.dumps({
            "metric": "chaos_coteach_epoch_seconds", "value": -1,
            "unit": "s/epoch", "vs_baseline": 0,
            "error": "tpu_backend_unavailable",
        }))
        return 1

    variant = "comparison" if args.supervised else "proposed"
    cfg = make_config(args.batch, variant, args.task, args.eval_batch,
                      args.block_barrier)
    log(f"building trainer ({args.task} point, decode on 1 host core)...")
    trainer = build_trainer(cfg, args.task)
    trainer._bench_task = args.task  # for the plain-flops subprocess probe
    if args.eval_volume:
        # eval-only: no train-step compile needed (~minutes saved); the
        # predict programs warm up inside the bench itself
        return eval_volume_bench(trainer, cfg, args)
    log("trainer built; warmup epoch 0 (compiles train/eval/predict)...")
    trainer.run_epoch(0)
    log("warmup done; timing bare train steps...")

    dt, step_flops, model_flops = time_bare_steps(trainer, cfg)
    baseline = SUPERVISED_BASELINE_S if args.supervised else BASELINE_EPOCH_S
    epoch_slices = EPOCH_SLICES if args.task == "chaos" else len(trainer.train_pipe)
    step_epoch_s = epoch_slices * dt / args.batch
    step_tflops = step_flops / dt / 1e12 if step_flops else 0.0
    mfu_basis = "model" if model_flops else "executed"
    model_tflops = (model_flops or step_flops) / dt / 1e12 if dt else 0.0
    extras = {
        "task": args.task,
        "batch_size": args.batch,
        "block_barrier": bool(args.block_barrier),
        "train_step_epoch_seconds": round(step_epoch_s, 2),
        # PRIMARY utilization number: plain-model (algorithmic) FLOPs over
        # the measured step time — packed execution's structural zeros are
        # excluded. The executed-FLOPs figures are secondary. When the
        # plain-flops probe fails, train_step_mfu falls back to the
        # executed basis — mfu_basis says which one this row carries so a
        # fallback can never masquerade as the honest number.
        "train_step_mfu": round(model_tflops / PEAK_TFLOPS, 3),
        "mfu_basis": mfu_basis,
        "train_step_model_tflops_per_s": round(model_tflops, 1),
        # executed-FLOPs throughput under its historical key (BENCH_r01-03
        # recorded train_step_tflops_per_s on this basis)
        "train_step_tflops_per_s": round(step_tflops, 1),
        "train_step_mfu_executed": round(step_tflops / PEAK_TFLOPS, 3),
    }

    metric_name = (
        f"{args.task}_supervised_epoch_seconds"
        if args.supervised
        else f"{args.task}_coteach_epoch_seconds"
    )
    partial.update(
        {
            "metric": metric_name,
            "value": round(step_epoch_s, 2),
            "unit": "s/epoch",
            "vs_baseline": round(baseline / step_epoch_s, 2),
            "partial": "steps_only",
            **extras,
        }
    )

    if args.steps_only:
        # keep the marker: a step-extrapolated number must not read as an
        # honest full-epoch measurement
        value = step_epoch_s
        extras["partial"] = "steps_only"
    else:
        log("timing full epoch 1...")
        if args.profile:
            with jax.profiler.trace(args.profile):
                row = trainer.run_epoch(1)
        else:
            row = trainer.run_epoch(1)
        value = float(row["time"])
        extras["full_epoch_includes"] = (
            "train+test_eval+case reinference+checkpoint"
            if args.supervised
            else "train+test_eval+2x case reinference+checkpoint+refresh"
        )
        extras.update(
            {k: v for k, v in row.items() if k.startswith("time_")}
        )

    partial.clear()  # a full result follows; disarm the SIGTERM fallback
    print(
        json.dumps(
            {
                "metric": metric_name,
                "value": round(value, 2),
                "unit": "s/epoch",
                "vs_baseline": round(baseline / value, 2),
                **extras,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
