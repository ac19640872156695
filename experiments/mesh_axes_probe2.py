"""Isolate the net-axis divergence seen in mesh_axes_probe.py.

Runs the co-teach step on the (data=4, net=2) mesh with
(a) state replicated, (b) state net-sharded, twice each, and prints the
per-image ranking losses so a clean/suspect selection flip is visible.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aide_tpu.core.config import MeshConfig, ModelConfig, TrainConfig
from aide_tpu.core.mesh import make_mesh
from aide_tpu.engine import steps
from aide_tpu.engine.state import DualTrainState
from aide_tpu.models import build_model
from aide_tpu.ops import make_optimizer

from experiments.mesh_axes_probe import clone, shard_state_net, shard_batch_spatial


def main():
    cfg = TrainConfig()
    cfg.model = ModelConfig(name="unet4", compute_dtype="float32", norm="batch")
    cfg.data.img_size = 16
    cfg.data.batch_size = 8
    cfg.data.num_tta_views = 2
    cfg.coteach.warmup_epochs = 2

    model = build_model(cfg.model)
    x = jnp.zeros((1, 16, 16, 3))
    v1 = model.init(jax.random.key(0), x, train=False)
    v2 = model.init(jax.random.key(1), x, train=False)
    tx = make_optimizer(cfg.optim, 4, 2)
    base = DualTrainState.create(v1, v2, tx)

    rng = np.random.default_rng(5)
    batch = {
        "image": rng.normal(size=(8, 16, 16, 3)).astype(np.float32),
        "fill": rng.normal(size=(8, 3)).astype(np.float32),
        "target1": (rng.random((8, 16, 16)) > 0.7).astype(np.int32),
        "target2": (rng.random((8, 16, 16)) > 0.7).astype(np.int32),
    }
    step = steps.make_coteach_train_step(model, False, cfg)
    key = jax.random.key(9)
    rate = jnp.asarray(0.5)

    # debug fn: per-image ranking losses from the main forward
    fwdfn = steps.make_forward(model, False)
    crit = steps.make_image_criterion(cfg)

    @jax.jit
    def ranking(state, batch):
        imgs = steps.batch_images(batch, False)

        def fwd(params, stats):
            return fwdfn(params, stats, imgs, True, True)

        outputs, _ = jax.vmap(fwd)(state.params, state.batch_stats)
        pre1 = crit(outputs[0], batch["target2"])
        pre2 = crit(outputs[1], batch["target1"])
        return pre1, pre2

    mesh1 = make_mesh(MeshConfig(num_devices=1))
    b1 = shard_batch_spatial(batch, mesh1)
    base1 = clone(base)
    r1 = jax.device_get(ranking(base1, b1))
    _, m_ref = step(base1, b1, key, rate)
    m_ref = jax.device_get(m_ref)
    print("single-dev pre1:", np.array2string(r1[0], precision=6))
    print("single-dev pre2:", np.array2string(r1[1], precision=6))

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "net"))
    bt = shard_batch_spatial(batch, mesh)

    for tag, put in (
        ("replicated", lambda s: jax.device_put(s, NamedSharding(mesh, P()))),
        ("net-sharded", lambda s: shard_state_net(s, mesh)),
    ):
        for run in (1, 2):
            st = put(clone(base))
            rr = jax.device_get(ranking(st, bt))
            d1 = np.max(np.abs(rr[0] - r1[0]))
            d2 = np.max(np.abs(rr[1] - r1[1]))
            st2 = put(clone(base))
            _, m = step(st2, bt, key, rate)
            m = jax.device_get(m)
            dl = {
                k: abs(float(m[k]) - float(m_ref[k]))
                for k in ("loss1", "loss2")
            }
            print(
                f"{tag} run{run}: max pre diff {d1:.2e}/{d2:.2e} "
                f"order1 {np.argsort(rr[0])} order2 {np.argsort(rr[1])} "
                f"loss diffs {dl}"
            )
    print("ref order1", np.argsort(r1[0]), "order2", np.argsort(r1[1]))


if __name__ == "__main__":
    main()
