"""Distributed correctness: the data-parallel step IS the single-device step.

The reference's only scaling story is single-host DataParallel
(trainchaos_proposed_30cases1labeled.py:183-186), which averages gradients
over replicas. Our replacement shards the batch over a `jax.sharding.Mesh`
data axis and lets GSPMD insert the collectives; this test pins that the
8-device sharded co-teaching step produces the same losses and the same
updated parameters as the identical step on one device (global batch
semantics, including BatchNorm batch statistics, survive sharding).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aide_tpu.core.config import ModelConfig, TrainConfig
from aide_tpu.core.mesh import make_mesh, shard_batch
from aide_tpu.core.config import MeshConfig
from aide_tpu.engine import steps
from aide_tpu.engine.state import DualTrainState
from aide_tpu.models import build_model
from aide_tpu.ops import make_optimizer


def _clone(state):
    return jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), state)


@pytest.mark.slow
def test_data_parallel_step_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest env)")

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

    results = {}
    for n in (1, 8):
        mesh = make_mesh(MeshConfig(num_devices=n))
        sharded = shard_batch(copy.deepcopy(batch), mesh)
        new_state, m = step(_clone(base), sharded, key, rate)
        results[n] = (
            jax.device_get(jax.tree_util.tree_leaves(new_state.params)),
            jax.device_get(m),
        )

    p1, m1 = results[1]
    p8, m8 = results[8]
    for k in ("loss1", "loss2", "dice1_sum", "dice2_sum"):
        assert np.isclose(float(m1[k]), float(m8[k]), rtol=1e-5, atol=1e-5), (
            k, float(m1[k]), float(m8[k]),
        )
    # Adam normalizes each update to ~lr scale, so reduction-order float
    # noise in near-zero gradients can flip individual update signs; a few
    # lr quanta (lr=1e-4) is the honest per-element tolerance. Unsynced or
    # wrongly-scaled gradients would differ at WEIGHT scale (~1e-1) and
    # still fail loudly here.
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(a, b, atol=3e-4)
