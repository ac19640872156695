"""Prototype: richer mesh layouts for the co-teaching step.

Beyond pure data-parallel, two more axes map naturally onto this workload:

- ``net``  — the dual co-teaching networks live on a stacked leading axis of
  size 2 (engine/state.py); sharding that axis over a 2-way mesh axis is
  model parallelism: each half of the mesh computes one net, and the
  cross-net couplings (pseudo-label exchange, small-loss order swap) become
  collectives over ``net``. This is the TPU-native analogue of placing the
  reference's net1/net2 on separate GPUs.
- ``space`` — shard the image height dim; GSPMD spatially partitions the
  convolutions (halo exchange via collective-permute), the BN reductions
  become all-reduces. This is sequence/spatial parallelism for 2-D conv
  workloads.

Run: JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8 (set below).
Compares losses and updated params of (data=4×net=2) and (data=2×net=2×
space=2) meshes against the single-device step.
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


def clone(t):
    return jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), t)


def shard_state_net(state, mesh, net_axis="net"):
    """Shard every stacked dual-net leaf (leading dim 2) over the net axis."""
    net_sh = NamedSharding(mesh, P(net_axis))
    repl = NamedSharding(mesh, P())

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 2:
            return jax.device_put(x, net_sh)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, state)


def shard_batch_spatial(batch, mesh, data_axis="data", space_axis=None):
    out = {}
    for k, v in batch.items():
        if v.ndim >= 3 and space_axis is not None:
            spec = P(data_axis, space_axis)
        else:
            spec = P(data_axis)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


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

    # ---- reference: single device ----
    mesh1 = make_mesh(MeshConfig(num_devices=1))
    b1 = shard_batch_spatial(batch, mesh1)
    s_ref, m_ref = step(clone(base), b1, key, rate)
    p_ref = jax.device_get(jax.tree_util.tree_leaves(s_ref.params))
    m_ref = jax.device_get(m_ref)

    def compare(tag, state, m):
        p = jax.device_get(jax.tree_util.tree_leaves(state.params))
        dm = {
            k: abs(float(m[k]) - float(m_ref[k]))
            for k in ("loss1", "loss2", "dice1_sum", "dice2_sum")
        }
        dp = max(np.max(np.abs(a - b)) for a, b in zip(p, p_ref))
        print(f"{tag}: metric diffs {dm} | max param diff {dp:.3e}")

    # ---- data x net ----
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "net"))
    st = shard_state_net(clone(base), mesh)
    bt = shard_batch_spatial(batch, mesh)
    s2, m2 = step(st, bt, key, rate)
    compare("data4 x net2", s2, jax.device_get(m2))

    # ---- data x net x space ----
    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "net", "space"))
    st = shard_state_net(clone(base), mesh)
    bt = shard_batch_spatial(batch, mesh, space_axis="space")
    s3, m3 = step(st, bt, key, rate)
    compare("data2 x net2 x space2", s3, jax.device_get(m3))

    # ---- pure space (stress halo exchange) ----
    devs = np.asarray(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devs, ("data", "space"))
    bt = shard_batch_spatial(batch, mesh, space_axis="space")
    st = jax.device_put(clone(base), NamedSharding(mesh, P()))
    s4, m4 = step(st, bt, key, rate)
    compare("data1 x space8", s4, jax.device_get(m4))


if __name__ == "__main__":
    main()
