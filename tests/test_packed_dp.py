"""Distributed correctness of the packed (space-to-depth) execution path.

bench.py's perf path runs the packed models (models/packed.py); this pins
that packing — which rewrites the spatial layout of the narrow stages but
never touches the batch axis — stays exactly the plain model under an
8-device data-parallel mesh: same losses, same updated parameters as the
identical packed step on one device, and the same as the PLAIN model's
step on the mesh (the packed/plain fwd equality of test_packed.py, now
under GSPMD sharding).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aide_tpu.core.config import MeshConfig, ModelConfig, TrainConfig
from aide_tpu.core.mesh import make_mesh, shard_batch
from aide_tpu.engine import steps
from aide_tpu.engine.state import DualTrainState
from aide_tpu.models import build_model
from aide_tpu.ops import make_optimizer


def _clone(state):
    return jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), state)


def _run(cfg, model, batch, n_devices):
    x = jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3))
    v1 = model.init(jax.random.key(0), x, train=False)
    v2 = model.init(jax.random.key(1), x, train=False)
    base = DualTrainState.create(v1, v2, make_optimizer(cfg.optim, 4, 2))
    step = steps.make_coteach_train_step(model, False, cfg)
    mesh = make_mesh(MeshConfig(num_devices=n_devices))
    sharded = shard_batch(copy.deepcopy(batch), mesh)
    new_state, m = step(_clone(base), sharded, jax.random.key(9), jnp.asarray(0.5))
    return (
        jax.device_get(jax.tree_util.tree_leaves(new_state.params)),
        jax.device_get(m),
    )


@pytest.mark.slow
def test_packed_data_parallel_step_matches_single_device_and_plain():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest env)")

    cfg = TrainConfig()
    cfg.model = ModelConfig(
        name="unet4", compute_dtype="float32", norm="batch", packed=True
    )
    cfg.data.img_size = 16
    cfg.data.batch_size = 8
    cfg.data.num_tta_views = 2
    cfg.coteach.warmup_epochs = 2

    rng = np.random.default_rng(5)
    batch = {
        "image": rng.normal(size=(8, 16, 16, 3)).astype(np.float32),
        "fill": rng.normal(size=(8, 3)).astype(np.float32),
        "target1": (rng.random((8, 16, 16)) > 0.7).astype(np.int32),
        "target2": (rng.random((8, 16, 16)) > 0.7).astype(np.int32),
    }

    packed = build_model(cfg.model)
    p1, m1 = _run(cfg, packed, batch, 1)
    p8, m8 = _run(cfg, packed, batch, 8)

    plain_cfg = copy.deepcopy(cfg)
    plain_cfg.model.packed = False
    plain = build_model(plain_cfg.model)
    q8, n8 = _run(plain_cfg, plain, batch, 8)

    for k in ("loss1", "loss2", "dice1_sum", "dice2_sum"):
        assert np.isclose(float(m1[k]), float(m8[k]), rtol=1e-5, atol=1e-5), (
            "packed 1-dev vs 8-dev", k, float(m1[k]), float(m8[k]),
        )
        assert np.isclose(float(n8[k]), float(m8[k]), rtol=1e-5, atol=1e-5), (
            "packed vs plain on the mesh", k, float(n8[k]), float(m8[k]),
        )
    # see test_dp_equivalence.py for the Adam update-sign tolerance rationale
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(a, b, atol=3e-4)
    for a, b in zip(q8, p8):
        np.testing.assert_allclose(a, b, atol=3e-4)
