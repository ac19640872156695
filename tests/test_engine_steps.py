"""Engine step tests on a tiny UNet (1-CPU friendly shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aide_tpu.core.config import TrainConfig, ModelConfig
from aide_tpu.models import build_model
from aide_tpu.ops import make_optimizer
from aide_tpu.engine.state import TrainState, DualTrainState
from aide_tpu.engine import steps


def tiny_cfg():
    cfg = TrainConfig()
    cfg.model = ModelConfig(name="unet2", compute_dtype="float32")
    cfg.data.img_size = 16
    cfg.data.batch_size = 4
    cfg.data.num_tta_views = 2
    return cfg


def make_batch(b=4, s=16, seed=0, dual=True):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(b, s, s, 3)).astype(np.float32)
    target = (rng.random((b, s, s)) > 0.7).astype(np.int32)
    batch = {
        "image": jnp.asarray(img),
        "fill": jnp.zeros((b, 3)),
        "target": jnp.asarray(target),
    }
    if dual:
        batch["target1"] = jnp.asarray(target)
        batch["target2"] = jnp.asarray(
            (rng.random((b, s, s)) > 0.7).astype(np.int32)
        )
    return batch


def _clone(tree):
    """Deep-copy a pytree: the train steps donate their input state, so any
    buffer shared with a donated state is deleted after the call."""
    return jax.tree_util.tree_map(jnp.copy, tree)


@pytest.fixture(scope="module")
def _setup_raw():
    cfg = tiny_cfg()
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.optim, steps_per_epoch=10, num_epochs=10)
    x = jnp.zeros((1, 16, 16, 3))
    v1 = model.init(jax.random.key(0), x, train=False)
    v2 = model.init(jax.random.key(1), x, train=False)
    return cfg, model, tx, v1, v2


@pytest.fixture
def setup(_setup_raw):
    cfg, model, tx, v1, v2 = _setup_raw
    return cfg, model, tx, _clone(v1), _clone(v2)


class TestSupervised:
    @pytest.mark.slow
    def test_step_updates_params(self, setup):
        cfg, model, tx, v1, _ = setup
        state = TrainState.create(v1, tx)
        step = steps.make_supervised_train_step(model, False, cfg)
        batch = make_batch(dual=False)
        new_state, m = step(_clone(state), batch)
        assert np.isfinite(float(m["loss"]))
        assert 0.0 <= float(m["dice_sum"]) <= 4.0
        delta = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
        )
        assert max(jax.tree_util.tree_leaves(delta)) > 0

    @pytest.mark.slow
    def test_loss_decreases_overfit(self, setup):
        cfg, model, tx, v1, _ = setup
        state = TrainState.create(v1, tx)
        step = steps.make_supervised_train_step(model, False, cfg)
        batch = make_batch(dual=False)
        first = None
        for i in range(20):
            state, m = step(state, batch)
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first


@pytest.mark.slow
class TestCoteach:
    def test_step_runs_and_is_deterministic(self, setup):
        cfg, model, tx, v1, v2 = setup
        state = DualTrainState.create(v1, v2, tx)
        step = steps.make_coteach_train_step(model, False, cfg)
        batch = make_batch()
        key = jax.random.key(7)
        rate = jnp.asarray(0.25)
        s1, m1 = step(_clone(state), batch, key, rate)
        s2, m2 = step(_clone(state), batch, key, rate)
        for k in ("loss1", "loss2", "dice1_sum", "dice2_sum"):
            assert np.isfinite(float(m1[k]))
            assert float(m1[k]) == float(m2[k])  # same key -> identical
        p1 = jax.tree_util.tree_leaves(s1.params)
        p2 = jax.tree_util.tree_leaves(s2.params)
        assert all(np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(p1, p2))

    def test_nets_diverge(self, setup):
        """The two nets start different and receive different gradients."""
        cfg, model, tx, v1, v2 = setup
        state = DualTrainState.create(v1, v2, tx)
        step = steps.make_coteach_train_step(model, False, cfg)
        new_state, _ = step(_clone(state), make_batch(), jax.random.key(0), jnp.asarray(1.0))
        updates = jax.tree_util.tree_map(
            lambda new, old: np.asarray(new - old), new_state.params, state.params
        )
        diffs = [
            np.abs(u[0] - u[1]).max() for u in jax.tree_util.tree_leaves(updates)
        ]
        assert max(diffs) > 1e-8  # the two nets received different gradients

    def test_rate_zero_disables_consistency(self, setup):
        """At rate=0 the loss is purely segmentation (warmup epoch 0)."""
        cfg, model, tx, v1, v2 = setup
        state = DualTrainState.create(v1, v2, tx)
        step = steps.make_coteach_train_step(model, False, cfg)
        batch = make_batch()
        _, m0 = step(state, batch, jax.random.key(3), jnp.asarray(0.0))
        # loss at rate 0 = mean(clean) + 1.0*mean(suspect); both finite
        assert np.isfinite(float(m0["loss1"]))

    def test_batch_stats_updated_per_net(self, setup):
        cfg, model, tx, v1, v2 = setup
        state = DualTrainState.create(v1, v2, tx)
        step = steps.make_coteach_train_step(model, False, cfg)
        new_state, _ = step(_clone(state), make_batch(), jax.random.key(0), jnp.asarray(0.5))
        old = jax.tree_util.tree_leaves(state.batch_stats)
        new = jax.tree_util.tree_leaves(new_state.batch_stats)
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        )
        assert all(a.shape[0] == 2 for a in new)


class TestEvalPredict:
    def test_dual_eval_and_predict(self, setup):
        cfg, model, tx, v1, v2 = setup
        state = DualTrainState.create(v1, v2, tx)
        ev = steps.make_eval_step(model, False, cfg, dual=True)
        m = ev(state, make_batch())
        assert np.isfinite(float(m["loss1"])) and np.isfinite(float(m["loss2"]))
        pred = steps.make_predict_step(model, False, dual=True)(state, make_batch())
        # binary labels come back bit-packed along width (8 px/byte) to cut
        # the device->host fetch 8x; case_eval unpacks on host
        assert pred.shape == (2, 4, 16, 2)
        assert pred.dtype == jnp.uint8
        labels = np.unpackbits(np.asarray(pred), axis=-1, count=16)
        assert labels.shape == (2, 4, 16, 16)
        assert set(np.unique(labels)) <= {0, 1}

    def test_single_eval(self, setup):
        cfg, model, tx, v1, _ = setup
        state = TrainState.create(v1, tx)
        ev = steps.make_eval_step(model, False, cfg, dual=False)
        m = ev(state, make_batch(dual=False))
        assert np.isfinite(float(m["loss"]))


class TestEdgeCases:
    def test_coteach_batch_one_finite(self, setup):
        """bs=1 makes the suspect half empty (k_clean==b); the step must
        stay finite instead of producing NaN via a mean over zero images."""
        cfg, model, tx, v1, v2 = setup
        state = DualTrainState.create(v1, v2, tx)
        step = steps.make_coteach_train_step(model, False, cfg)
        batch = make_batch(b=1, dual=True)
        new_state, m = step(state, batch, jax.random.key(0), jnp.asarray(0.5))
        assert np.isfinite(float(m["loss1"]))
        assert np.isfinite(float(m["loss2"]))
        leaves = jax.tree_util.tree_leaves(new_state.params)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_polylr_no_wraparound():
    """Past num_epochs the LR must stay decayed (clamped at 0), not snap
    back to base rate (the reference's epoch%max defect, documented in
    ops/schedules.py)."""
    from aide_tpu.core.config import OptimConfig
    from aide_tpu.ops.schedules import make_lr_schedule

    cfg = OptimConfig(lr_policy="PolyLR", lr=0.1)
    sched = make_lr_schedule(cfg, steps_per_epoch=1, num_epochs=10)
    assert float(sched(9)) > 0.0
    assert float(sched(10)) == 0.0   # epoch == num_epochs
    assert float(sched(15)) == 0.0   # and stays there
