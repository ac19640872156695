"""Benchmark: CHAOS co-teaching epoch time on TPU vs the reference baseline.

The reference reports ~420 s/epoch for the flagship CHAOS proposed config —
dual FuseUNet co-teaching, 984 training slices, batch 4, 4 TTA views, 256x256
(/root/reference/README.md:45; SURVEY §6). This benchmark times OUR complete
jitted co-teaching train step (TTA view warps + 8 net-view forwards + pseudo
label ensemble + cross small-loss selection + consistency + both backwards +
optimizer) at the same operating point on the real chip and converts to an
epoch-time-equivalent over 984 slices.

Prints ONE JSON line:
  {"metric": "chaos_coteach_epoch_seconds", "value": <s>, "unit": "s/epoch",
   "vs_baseline": <420 / value>}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

EPOCH_SLICES = 984      # CHAOS proposed train set (README.md:45)
BASELINE_EPOCH_S = 420.0


def main() -> int:
    from aide_tpu.core.config import ModelConfig, TrainConfig
    from aide_tpu.engine import steps as steps_mod
    from aide_tpu.engine.state import DualTrainState
    from aide_tpu.models import build_model
    from aide_tpu.ops.schedules import make_optimizer

    batch = 4
    size = 256

    cfg = TrainConfig()
    cfg.model = ModelConfig(name="fuseunet", compute_dtype="bfloat16")
    cfg.data.img_size = size
    cfg.data.batch_size = batch
    cfg.data.num_tta_views = 4
    cfg.data.rotation_degree = 60.0

    model = build_model(cfg.model)
    x = jnp.zeros((1, size, size, 3))
    v1 = model.init(jax.random.key(0), x, x, train=False)
    v2 = model.init(jax.random.key(1), x, x, train=False)
    tx = make_optimizer(cfg.optim, EPOCH_SLICES // batch, cfg.num_epochs)
    state = DualTrainState.create(v1, v2, tx)

    rng = np.random.default_rng(0)
    data = {
        "modal1": jnp.asarray(rng.normal(size=(batch, size, size, 3)), jnp.float32),
        "modal2": jnp.asarray(rng.normal(size=(batch, size, size, 3)), jnp.float32),
        "fill1": jnp.asarray(rng.normal(size=(batch, 3)), jnp.float32),
        "fill2": jnp.asarray(rng.normal(size=(batch, 3)), jnp.float32),
        "target1": jnp.asarray(rng.random((batch, size, size)) > 0.7, jnp.int32),
        "target2": jnp.asarray(rng.random((batch, size, size)) > 0.7, jnp.int32),
    }

    step = steps_mod.make_coteach_train_step(model, True, cfg)
    rate = jnp.asarray(0.5)

    # warmup / compile. NOTE: value fetches (float(...)), not
    # block_until_ready — on the tunneled PJRT backend block_until_ready
    # returns before remote execution completes; only a device->host value
    # transfer is a true synchronization point.
    key = jax.random.key(0)
    state, m = step(state, data, key, rate)
    float(m["loss1"])
    for i in range(3):
        state, m = step(state, data, jax.random.fold_in(key, i), rate)
    float(m["loss1"])

    iters = 32
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, data, jax.random.fold_in(key, 100 + i), rate)
    float(m["loss1"])
    dt = time.perf_counter() - t0

    step_s = dt / iters
    slices_per_s = batch / step_s
    epoch_s = EPOCH_SLICES / slices_per_s
    print(
        json.dumps(
            {
                "metric": "chaos_coteach_epoch_seconds",
                "value": round(epoch_s, 2),
                "unit": "s/epoch",
                "vs_baseline": round(BASELINE_EPOCH_S / epoch_s, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
