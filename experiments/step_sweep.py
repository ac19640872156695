"""Co-teach step time sweep (bs x remat) + eval forward, on the real chip.

python experiments/step_sweep.py [bs ...]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from aide_tpu.core.config import ModelConfig, TrainConfig
    from aide_tpu.engine import steps as steps_mod
    from aide_tpu.engine.state import DualTrainState
    from aide_tpu.models import build_model
    from aide_tpu.ops.schedules import make_optimizer

    size = 256
    sweeps = [(8, False), (16, True)]
    if len(sys.argv) > 1:
        sweeps = []
        for a in sys.argv[1:]:
            bs, _, rm = a.partition(":")
            sweeps.append((int(bs), rm == "remat"))

    out = {}
    for batch, remat in sweeps:
        cfg = TrainConfig()
        cfg.model = ModelConfig(
            name="fuseunet", compute_dtype="bfloat16", remat=remat
        )
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
        key, rate = jax.random.key(0), jnp.asarray(0.5)
        try:
            state, m = step(state, data, key, rate)
            float(m["loss1"])
            for i in range(2):
                state, m = step(state, data, jax.random.fold_in(key, i), rate)
            float(m["loss1"])
            iters = 12
            t0 = time.perf_counter()
            for i in range(iters):
                state, m = step(state, data, jax.random.fold_in(key, 9 + i), rate)
            float(m["loss1"])
            dt = (time.perf_counter() - t0) / iters
            tag = f"bs{batch}" + ("_remat" if remat else "")
            out[tag] = {
                "step_ms": round(dt * 1e3, 1),
                "slices_per_s": round(batch / dt, 1),
                "epoch_s_984": round(984 * dt / batch, 1),
            }
            print(json.dumps({tag: out[tag]}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({f"bs{batch}": f"FAILED {type(e).__name__}"}), flush=True)

    # eval-mode dual predict at eval batch 32 (the case re-inference path)
    cfg = TrainConfig()
    cfg.model = ModelConfig(name="fuseunet", compute_dtype="bfloat16")
    cfg.data.img_size = size
    model = build_model(cfg.model)
    x = jnp.zeros((1, size, size, 3))
    v1 = model.init(jax.random.key(0), x, x, train=False)
    v2 = model.init(jax.random.key(1), x, x, train=False)
    state = DualTrainState.create(v1, v2, make_optimizer(cfg.optim, 1, 1))
    predict = steps_mod.make_predict_step(model, True, dual=True)
    rng = np.random.default_rng(0)
    eb = 32
    pb = {
        "modal1": jnp.asarray(rng.normal(size=(eb, size, size, 3)), jnp.float32),
        "modal2": jnp.asarray(rng.normal(size=(eb, size, size, 3)), jnp.float32),
        "fill1": jnp.zeros((eb, 3)), "fill2": jnp.zeros((eb, 3)),
    }
    p = predict(state, pb); np.asarray(p)
    t0 = time.perf_counter()
    for _ in range(8):
        p = predict(state, pb)
    np.asarray(p)
    dt = (time.perf_counter() - t0) / 8
    out["predict_eb32"] = {"ms": round(dt * 1e3, 1),
                           "slices_per_s": round(eb / dt, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
