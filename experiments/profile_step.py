"""Capture an xprof trace of the co-teach step and dump the top HLO ops.

Run in the default env (real chip): python experiments/profile_step.py
"""

import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/aide_step_trace"


def main():
    from aide_tpu.core.config import ModelConfig, TrainConfig
    from aide_tpu.engine import steps as steps_mod
    from aide_tpu.engine.state import DualTrainState
    from aide_tpu.models import build_model
    from aide_tpu.ops.schedules import make_optimizer

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--tag", default="")
    ap.add_argument("--model", default="fuseunet",
                    help="fuseunet (chaos) or unet (kidney/breast points)")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    global TRACE_DIR
    if args.tag:
        TRACE_DIR = f"/tmp/aide_step_trace_{args.tag}"
    size, batch = args.size, args.batch
    cfg = TrainConfig()
    cfg.model = ModelConfig(name=args.model, compute_dtype="bfloat16",
                            packed=args.packed)
    cfg.data.img_size = size
    cfg.data.batch_size = batch
    cfg.data.num_tta_views = 4

    from aide_tpu.models import is_two_modal

    model = build_model(cfg.model)
    x = jnp.zeros((1, size, size, 3))
    two_modal = is_two_modal(args.model)
    if two_modal:
        v1 = model.init(jax.random.key(0), x, x, train=False)
        v2 = model.init(jax.random.key(1), x, x, train=False)
    else:
        v1 = model.init(jax.random.key(0), x, train=False)
        v2 = model.init(jax.random.key(1), x, train=False)
    tx = make_optimizer(cfg.optim, 123, 100)
    state = DualTrainState.create(v1, v2, tx)

    rng = np.random.default_rng(0)
    data = {
        "target1": jnp.asarray(rng.random((batch, size, size)) > 0.7, jnp.int32),
        "target2": jnp.asarray(rng.random((batch, size, size)) > 0.7, jnp.int32),
    }
    if two_modal:
        data["modal1"] = jnp.asarray(
            rng.normal(size=(batch, size, size, 3)), jnp.float32)
        data["modal2"] = jnp.asarray(
            rng.normal(size=(batch, size, size, 3)), jnp.float32)
        data["fill1"] = jnp.zeros((batch, 3))
        data["fill2"] = jnp.zeros((batch, 3))
    else:
        data["image"] = jnp.asarray(
            rng.normal(size=(batch, size, size, 3)), jnp.float32)
        data["fill"] = jnp.zeros((batch, 3))
    step = steps_mod.make_coteach_train_step(model, two_modal, cfg)
    key, rate = jax.random.key(0), jnp.asarray(0.5)

    state, m = step(state, data, key, rate)
    float(m["loss1"])
    with jax.profiler.trace(TRACE_DIR):
        for i in range(3):
            state, m = step(state, data, jax.random.fold_in(key, i), rate)
        float(m["loss1"])
    print("trace written")

    # ---- parse: top ops by self time ----
    files = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True),
                   key=os.path.getmtime, reverse=True)
    print("xplane files:", files)
    if not files:
        return
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    session = os.path.dirname(files[0])
    for tool in ("framework_op_stats", "op_profile", "hlo_stats"):
        try:
            data_out, _ = rtd.xspace_to_tool_data([files[0]], tool, {})
            out = f"/tmp/aide_step_{tool}{('_' + args.tag) if args.tag else ''}.json"
            mode = "wb" if isinstance(data_out, bytes) else "w"
            with open(out, mode) as fh:
                fh.write(data_out)
            print("wrote", out, len(data_out))
        except Exception as e:  # noqa: BLE001
            print(tool, "failed:", type(e).__name__, str(e)[:200])


if __name__ == "__main__":
    main()
