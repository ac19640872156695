"""Where does the co-teach step's time go on one real TPU chip?

Times the pieces of the flagship step separately (TTA view forwards, main
fwd+bwd, warps) and compares the vmapped dual-net forward against a
single-net forward at doubled batch — quantifying the cost of the vmap-
over-params lowering (grouped conv) vs a perfectly fused alternative.

Run in the default env (real chip): python experiments/perf_probe.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")  # keep PYTHONPATH default so the TPU
# sitecustomize still registers the tunneled backend (CLAUDE.md)

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=16, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    # tunneled backend: only a value fetch truly synchronizes
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def flops_of(fn, *args):
    try:
        comp = jax.jit(fn).lower(*args).compile()
        an = comp.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001
        print("cost_analysis failed:", e)
        return 0.0


def main():
    from aide_tpu.core.config import ModelConfig, TrainConfig
    from aide_tpu.engine import steps as steps_mod
    from aide_tpu.engine.state import DualTrainState
    from aide_tpu.models import build_model
    from aide_tpu.ops.schedules import make_optimizer
    from aide_tpu.ops import tta

    size = 256
    cfg = TrainConfig()
    cfg.model = ModelConfig(name="fuseunet", compute_dtype="bfloat16")
    cfg.data.img_size = size
    cfg.data.num_tta_views = 4

    model = build_model(cfg.model)
    x1 = jnp.zeros((1, size, size, 3))
    v1 = model.init(jax.random.key(0), x1, x1, train=False)
    v2 = model.init(jax.random.key(1), x1, x1, train=False)

    rng = np.random.default_rng(0)
    results = {}

    def fwd_single(params, stats, a, b):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        out, _ = model.apply(variables, a, b, train=True, mutable=["batch_stats"])
        return out

    for bs in (8,):
        a = jnp.asarray(rng.normal(size=(bs, size, size, 3)), jnp.float32)
        a2x = jnp.asarray(rng.normal(size=(2 * bs, size, size, 3)), jnp.float32)

        # (a) single-net forward at bs
        f1 = jax.jit(lambda p, s, u, v: fwd_single(p, s, u, v))
        t_single = timeit(
            f1, v1["params"], v1.get("batch_stats", {}), a, a
        )
        fl_single = flops_of(
            lambda p, s, u, v: fwd_single(p, s, u, v),
            v1["params"], v1.get("batch_stats", {}), a, a,
        )

        # (b) single-net forward at 2*bs (the "perfect fusion" bar)
        t_double = timeit(
            f1, v1["params"], v1.get("batch_stats", {}), a2x, a2x
        )

        # (c) vmapped dual forward at bs
        tx = make_optimizer(cfg.optim, 100, 100)
        dual = DualTrainState.create(v1, v2, tx)
        fv = jax.jit(
            lambda p, s, u, v: jax.vmap(lambda pp, ss: fwd_single(pp, ss, u, v))(p, s)
        )
        t_vmap = timeit(fv, dual.params, dual.batch_stats, a, a)
        fl_vmap = flops_of(
            lambda p, s, u, v: jax.vmap(lambda pp, ss: fwd_single(pp, ss, u, v))(p, s),
            dual.params, dual.batch_stats, a, a,
        )

        # (d) warps alone: forward views for one modality at V=4
        deg = jnp.asarray(rng.uniform(-60, 60, size=(4, bs)), jnp.float32)
        flip = jnp.asarray(rng.random((4, bs)) > 0.5, jnp.float32)
        fw = jax.jit(lambda img: tta.make_views(img, deg, flip, 0.0))
        t_warp = timeit(fw, a)

        # (e) full co-teach step at bs
        data = {
            "modal1": a, "modal2": a,
            "fill1": jnp.zeros((bs, 3)), "fill2": jnp.zeros((bs, 3)),
            "target1": jnp.asarray(rng.random((bs, size, size)) > 0.7, jnp.int32),
            "target2": jnp.asarray(rng.random((bs, size, size)) > 0.7, jnp.int32),
        }
        cfg.data.batch_size = bs
        step = steps_mod.make_coteach_train_step(model, True, cfg)
        state = DualTrainState.create(v1, v2, tx)
        key = jax.random.key(0)
        rate = jnp.asarray(0.5)

        def run_step(st):
            st, m = step(st, data, key, rate)
            return st, m

        # manual timing (state is donated; rebuild each warmup)
        st, m = step(state, data, key, rate)
        float(m["loss1"])
        iters = 12
        t0 = time.perf_counter()
        for i in range(iters):
            st, m = step(st, data, jax.random.fold_in(key, i), rate)
        float(m["loss1"])
        t_step = (time.perf_counter() - t0) / iters

        results[f"bs{bs}"] = {
            "t_single_fwd_ms": round(t_single * 1e3, 2),
            "t_single_fwd_2x_ms": round(t_double * 1e3, 2),
            "t_vmap_dual_fwd_ms": round(t_vmap * 1e3, 2),
            "vmap_penalty_vs_2x": round(t_vmap / t_double, 3),
            "t_warp4v_ms": round(t_warp * 1e3, 2),
            "t_coteach_step_ms": round(t_step * 1e3, 2),
            "fwd_flops_G": round(fl_single / 1e9, 1),
            "vmap_fwd_flops_G": round(fl_vmap / 1e9, 1),
            "fwd_tflops_per_s": round(fl_single / t_single / 1e12, 1),
            "vmap_fwd_tflops_per_s": round(fl_vmap / t_vmap / 1e12, 1),
        }
        print(json.dumps({f"bs{bs}": results[f"bs{bs}"]}, indent=2))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
