"""Semantics of config knobs with no other direct coverage.

Each test pins that a knob is LIVE (changing it changes behavior) and does
what its reference counterpart does: StepLR step/gamma and PolyLR power
(trainchaos_proposed_30cases1labeled.py:235-240, poly_lr_scheduler.py:31-52),
optimizer chain extras, the refresh cadence (every epoch during warmup then
every `refresh_interval`), the kidney warm start's symmetry noise, and the
step-level knobs tta_bn / clean_fraction / temperature
(trainkidney_proposed_mask1.py:267-268, trainbreast_dataset3_proposed...py:304).
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aide_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
from aide_tpu.engine import steps
from aide_tpu.engine.state import DualTrainState
from aide_tpu.models import build_model
from aide_tpu.ops import make_optimizer
from aide_tpu.ops.schedules import make_lr_schedule


# --------------------------- LR schedules ---------------------------


def test_steplr_step_size_and_gamma():
    cfg = OptimConfig(lr_policy="StepLR", lr=1.0, step_size=2, step_gamma=0.5)
    sched = make_lr_schedule(cfg, steps_per_epoch=3, num_epochs=10)
    # epoch = count // steps_per_epoch; decay every `step_size` epochs
    assert float(sched(0)) == 1.0      # epoch 0
    assert float(sched(5)) == 1.0      # epoch 1
    assert float(sched(6)) == 0.5      # epoch 2
    assert float(sched(12)) == 0.25    # epoch 4


def test_polylr_power():
    cfg = OptimConfig(lr_policy="PolyLR", lr=1.0, poly_power=2.0)
    sched = make_lr_schedule(cfg, steps_per_epoch=1, num_epochs=10)
    np.testing.assert_allclose(float(sched(5)), 0.25, rtol=1e-6)
    cfg9 = OptimConfig(lr_policy="PolyLR", lr=1.0, poly_power=0.9)
    s9 = make_lr_schedule(cfg9, steps_per_epoch=1, num_epochs=10)
    np.testing.assert_allclose(float(s9(5)), 0.5 ** 0.9, rtol=1e-6)


# --------------------------- optimizer chain ---------------------------


def _flat_params():
    return {"w": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([0.0])}


def test_grad_clip_norm_bounds_update():
    # sgd makes the clip directly observable (adam renormalizes per-param)
    cfg = OptimConfig(
        optimizer="sgd", lr_policy="", lr=1.0, grad_clip_norm=1.0
    )
    tx = make_optimizer(cfg, steps_per_epoch=1, num_epochs=1)
    params = _flat_params()
    grads = {"w": jnp.asarray([30.0, 40.0]), "b": jnp.asarray([0.0])}  # ‖g‖=50
    upd, _ = tx.update(grads, tx.init(params), params)
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(u**2) for u in jax.tree_util.tree_leaves(upd)))
    )
    np.testing.assert_allclose(gnorm, 1.0, rtol=1e-5)  # clipped, then -lr*g
    # direction preserved
    np.testing.assert_allclose(
        np.asarray(upd["w"]) / gnorm, [-0.6, -0.8], rtol=1e-5
    )


def test_weight_decay_pulls_toward_zero():
    cfg = OptimConfig(optimizer="sgd", lr_policy="", lr=0.1, weight_decay=0.5)
    tx = make_optimizer(cfg, steps_per_epoch=1, num_epochs=1)
    params = _flat_params()
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, _ = tx.update(zeros, tx.init(params), params)
    # zero grads: the whole update is the decay term, -lr * wd * params
    np.testing.assert_allclose(
        np.asarray(upd["w"]), -0.1 * 0.5 * np.asarray(params["w"]), rtol=1e-5
    )


# --------------------------- refresh cadence ---------------------------


def test_refresh_epoch_gate():
    from aide_tpu.engine.trainer import Trainer

    cfg = TrainConfig()
    cfg.coteach.warmup_epochs = 2
    cfg.coteach.refresh_interval = 3
    fake = types.SimpleNamespace(cfg=cfg)
    gate = lambda e: Trainer._is_refresh_epoch(fake, e)
    # e1 = epoch+1: every epoch while e1 <= warmup, then e1 % interval == 0
    assert [gate(e) for e in range(7)] == [
        True,   # e1=1 warmup
        True,   # e1=2 warmup
        True,   # e1=3 interval
        False,  # e1=4
        False,  # e1=5
        True,   # e1=6 interval
        False,  # e1=7
    ]


# --------------------------- warm start noise ---------------------------


def test_warm_start_noise_breaks_symmetry(tmp_path):
    from aide_tpu.engine.checkpoint import save_net, warm_start_dual

    model = build_model(
        ModelConfig(name="unet2", compute_dtype="float32", norm="group")
    )
    x = jnp.zeros((1, 16, 16, 3))
    v = model.init(jax.random.key(0), x, train=False)
    path = str(tmp_path / "net.msgpack")
    save_net(path, v, meta={})

    tx = make_optimizer(OptimConfig(), steps_per_epoch=1, num_epochs=1)
    v2 = model.init(jax.random.key(1), x, train=False)

    def max_net_gap(state):
        return max(
            float(jnp.abs(l[0] - l[1]).max())
            for l in jax.tree_util.tree_leaves(state.params)
        )

    base = DualTrainState.create(v, v2, tx)
    exact = warm_start_dual(base, path, symmetry_noise=0.0)
    assert max_net_gap(exact) == 0.0  # both nets = the checkpoint, bitwise
    ref = jax.tree_util.tree_leaves(v["params"])[0]
    got = jax.tree_util.tree_leaves(exact.params)[0]
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref))

    base = DualTrainState.create(v, v2, tx)
    noisy = warm_start_dual(base, path, symmetry_noise=1e-3)
    gap = max_net_gap(noisy)
    assert 0.0 < gap < 0.1  # perturbed apart, but still a warm start


# --------------------------- step-level knobs ---------------------------


@pytest.mark.slow
def test_step_knobs_are_live():
    """tta_bn / clean_fraction / temperature each change the coteach step's
    losses on the same state/batch/key (they gate real branches:
    steps.py k_clean, tta train-mode flag, sharpen temperature)."""

    def cfg_with(**co):
        cfg = TrainConfig()
        cfg.model = ModelConfig(
            name="unet2", compute_dtype="float32", norm="batch"
        )
        cfg.data.img_size = 16
        cfg.data.batch_size = 4
        cfg.data.num_tta_views = 2
        for k, val in co.items():
            setattr(cfg.coteach, k, val)
        return cfg

    rng = np.random.default_rng(0)
    b, s = 4, 16
    batch = {
        "image": jnp.asarray(rng.normal(size=(b, s, s, 3)).astype(np.float32)),
        "fill": jnp.zeros((b, 3)),
        "target1": jnp.asarray((rng.random((b, s, s)) > 0.7).astype(np.int32)),
        "target2": jnp.asarray((rng.random((b, s, s)) > 0.7).astype(np.int32)),
    }

    base_cfg = cfg_with()
    model = build_model(base_cfg.model)
    x = jnp.zeros((1, s, s, 3))
    v1 = model.init(jax.random.key(0), x, train=False)
    v2 = model.init(jax.random.key(1), x, train=False)
    tx = make_optimizer(base_cfg.optim, steps_per_epoch=10, num_epochs=10)

    def run(cfg):
        state = DualTrainState.create(
            jax.tree_util.tree_map(jnp.copy, v1),
            jax.tree_util.tree_map(jnp.copy, v2),
            tx,
        )
        step = steps.make_coteach_train_step(model, False, cfg)
        _, m = step(state, dict(batch), jax.random.key(7), jnp.asarray(0.5))
        return float(m["loss1"]), float(m["loss2"])

    base = run(base_cfg)
    assert base_cfg.coteach.tta_bn == "batch"  # documented default
    for variant in (
        cfg_with(tta_bn="eval"),
        cfg_with(clean_fraction=0.25),
        cfg_with(temperature=0.5),
    ):
        got = run(variant)
        assert np.isfinite(got[0]) and np.isfinite(got[1])
        assert got != base, variant.coteach
