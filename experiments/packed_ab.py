"""A/B: co-teaching train step, plain vs packed FuseUNet, bench op point.

Run in the default env (real chip): python experiments/packed_ab.py [iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def build(packed: bool, size=256, batch=8):
    from aide_tpu.core.config import ModelConfig, TrainConfig
    from aide_tpu.engine import steps as steps_mod
    from aide_tpu.engine.state import DualTrainState
    from aide_tpu.models import build_model
    from aide_tpu.ops.schedules import make_optimizer

    cfg = TrainConfig()
    cfg.model = ModelConfig(name="fuseunet", compute_dtype="bfloat16", packed=packed)
    cfg.data.img_size = size
    cfg.data.batch_size = batch
    cfg.data.num_tta_views = 4

    model = build_model(cfg.model)
    x = jnp.zeros((1, size, size, 3))
    v1 = model.init(jax.random.key(0), x, x, train=False)
    v2 = model.init(jax.random.key(1), x, x, train=False)
    tx = make_optimizer(cfg.optim, 123, 100)
    state = DualTrainState.create(v1, v2, tx)

    rng = np.random.default_rng(0)
    data = {
        "modal1": jnp.asarray(rng.normal(size=(batch, size, size, 3)), jnp.float32),
        "modal2": jnp.asarray(rng.normal(size=(batch, size, size, 3)), jnp.float32),
        "fill1": jnp.zeros((batch, 3)), "fill2": jnp.zeros((batch, 3)),
        "target1": jnp.asarray(rng.random((batch, size, size)) > 0.7, jnp.int32),
        "target2": jnp.asarray(rng.random((batch, size, size)) > 0.7, jnp.int32),
    }
    step = steps_mod.make_coteach_train_step(model, True, cfg)
    return step, state, data


def bench(packed: bool, iters: int, fuse_upsample: bool = False):
    from aide_tpu.models import packed as packed_mod

    packed_mod.FUSE_UPSAMPLE = fuse_upsample
    step, state, data = build(packed)
    key, rate = jax.random.key(0), jnp.asarray(0.5)
    t0 = time.time()
    state, m = step(state, data, key, rate)
    l0 = float(m["loss1"])
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(iters):
        state, m = step(state, data, jax.random.fold_in(key, i), rate)
    l1 = float(m["loss1"])  # fetch = sync
    dt = (time.time() - t0) / iters
    print(
        f"packed={packed}: step {dt*1e3:.1f} ms (compile {compile_s:.0f} s, "
        f"loss {l0:.4f} -> {l1:.4f})"
    )
    return dt, l1


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    if which in ("both", "plain"):
        t_plain, l_plain = bench(False, iters)
    if which in ("both", "packed"):
        t_packed, l_packed = bench(True, iters)
    if which == "both":
        print(
            f"speedup: {t_plain / t_packed:.3f}x  "
            f"(loss delta after {iters} steps: {abs(l_plain - l_packed):.5f})"
        )
    if which == "fuse":
        # A/B the folded-resize UpsampleConv inside the packed model
        t_unfused, l_a = bench(True, iters, fuse_upsample=False)
        t_fused, l_b = bench(True, iters, fuse_upsample=True)
        print(
            f"fused-upsample speedup: {t_unfused / t_fused:.3f}x "
            f"({t_unfused*1e3:.1f} -> {t_fused*1e3:.1f} ms; "
            f"loss delta {abs(l_a - l_b):.5f})"
        )


if __name__ == "__main__":
    main()
