"""Wiring tests for config knobs: augment_main, shuffle_seed,
eval.threshold, log_every_steps, and removed-knob compatibility."""

import json
import logging

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aide_tpu.core.config import ModelConfig, TrainConfig
from aide_tpu.data.tasks.synthetic import SyntheticTask
from aide_tpu.engine import steps as steps_mod
from aide_tpu.engine.state import TrainState
from aide_tpu.engine.trainer import Trainer


# --------------------------- augment_main ---------------------------


def _aug_cfg(rotation, hflip_prob, num_classes=2):
    cfg = TrainConfig()
    cfg.model.num_classes = num_classes
    cfg.data.rotation_degree = rotation
    cfg.data.hflip_prob = hflip_prob
    cfg.data.augment_main = True
    return cfg


def _batch(rng, b=3, s=16):
    img = rng.normal(size=(b, s, s, 3)).astype(np.float32)
    tgt = (rng.random((b, s, s)) > 0.6).astype(np.int32)
    return {
        "image": jnp.asarray(img),
        "fill": jnp.zeros((b, 3), jnp.float32),
        "target": jnp.asarray(tgt),
        "target1": jnp.asarray(tgt),
        "target2": jnp.asarray(1 - tgt),
    }


class TestAugmentMain:
    def test_pure_hflip_moves_image_and_targets_together(self, rng):
        import jax

        aug = steps_mod.make_augment_batch(_aug_cfg(0.0, 1.0), two_modal=False)
        batch = _batch(rng)
        out = aug(batch, jax.random.key(0))
        np.testing.assert_allclose(
            np.asarray(out["image"]),
            np.asarray(jnp.flip(batch["image"], axis=2)),
            atol=1e-5,
        )
        for t in ("target", "target1", "target2"):
            np.testing.assert_array_equal(
                np.asarray(out[t]), np.asarray(jnp.flip(batch[t], axis=2))
            )

    def test_no_aug_is_identity(self, rng):
        import jax

        aug = steps_mod.make_augment_batch(_aug_cfg(0.0, 0.0), two_modal=False)
        batch = _batch(rng)
        out = aug(batch, jax.random.key(0))
        np.testing.assert_allclose(
            np.asarray(out["image"]), np.asarray(batch["image"]), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(out["target"]), np.asarray(batch["target"])
        )

    def test_rotation_preserves_label_values_multiclass(self, rng):
        import jax

        aug = steps_mod.make_augment_batch(_aug_cfg(45.0, 0.5, 4), two_modal=False)
        batch = _batch(rng)
        batch["target"] = jnp.asarray(
            (rng.integers(0, 4, size=(3, 16, 16))).astype(np.int32)
        )
        out = aug(batch, jax.random.key(1))
        vals = np.unique(np.asarray(out["target"]))
        assert set(vals.tolist()) <= {0, 1, 2, 3}
        assert out["target"].dtype == batch["target"].dtype


# --------------------------- eval.threshold ---------------------------


class _ConstLogitModel:
    """Fake model: fg logit 1, bg logit 0 => fg prob ~0.731 everywhere."""

    def apply(self, variables, *images, train=False, mutable=None):
        x = images[0]
        shape = x.shape[:3]
        logits = jnp.stack([jnp.zeros(shape), jnp.ones(shape)], axis=-1)
        return logits


class TestEvalThreshold:
    def _run(self, threshold):
        cfg = TrainConfig()
        cfg.eval.threshold = threshold
        state = TrainState.create({"params": {}}, optax.sgd(1e-3))
        step = steps_mod.make_eval_step(
            _ConstLogitModel(), two_modal=False, cfg=cfg, dual=False
        )
        b, s = 2, 8
        batch = {
            "image": jnp.zeros((b, s, s, 3)),
            "fill": jnp.zeros((b, 3)),
            "target": jnp.ones((b, s, s), jnp.int32),
        }
        return float(step(state, batch)["dice_sum"])

    def test_threshold_flows_into_dice(self):
        # fg prob ~0.731: threshold 0.5 => all-fg pred (dice 1 per image),
        # threshold 0.9 => empty pred vs all-ones target (dice 0)
        assert self._run(0.5) == pytest.approx(2.0)
        assert self._run(0.9) == pytest.approx(0.0)


# ------------------- shuffle_seed / log_every_steps -------------------


def _stub_trainer(tmp_path, **cfg_kw):
    cfg = TrainConfig()
    cfg.model = ModelConfig(name="unet2", compute_dtype="float32", norm="group")
    cfg.data.task = "synthetic"
    cfg.data.variant = "comparison"
    cfg.data.img_size = 16
    cfg.data.batch_size = 4
    cfg.data.eval_batch_size = 4
    cfg.num_epochs = 1
    cfg.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.history_dir = str(tmp_path / "hist")
    for k, v in cfg_kw.items():
        node = cfg
        parts = k.split("__")
        for p in parts[:-1]:
            node = getattr(node, p)
        setattr(node, parts[-1], v)
    task = SyntheticTask(
        root=str(tmp_path / "synth"), num_cases=3, slices_per_case=4, size=16
    )
    tr = Trainer(cfg, task=task)

    seen = []

    def stub_step(state, batch):
        seen.append(np.asarray(batch["target"]).copy())
        return state, {
            "loss": jnp.asarray(0.5),
            "dice_sum": jnp.asarray(0.0),
            "count": jnp.asarray(batch["target"].shape[0], jnp.float32),
        }

    tr.train_step = stub_step
    return tr, seen


class TestShuffleSeed:
    def test_seed_changes_batch_order(self, tmp_path):
        tr, seen = _stub_trainer(tmp_path)
        tr._train_epoch(0, 0.0)
        first = [s.copy() for s in seen]
        seen.clear()
        tr._train_epoch(0, 0.0)  # same seed, same epoch => identical
        assert all(np.array_equal(a, b) for a, b in zip(first, seen))
        seen.clear()
        tr.cfg.data.shuffle_seed = 7
        tr._train_epoch(0, 0.0)
        assert not all(np.array_equal(a, b) for a, b in zip(first, seen))


class TestLogEverySteps:
    def test_midepoch_lines_emitted(self, tmp_path):
        tr, _ = _stub_trainer(tmp_path, log_every_steps=1)
        records = []

        class Capture(logging.Handler):
            def emit(self, record):
                records.append(record.getMessage())

        tr.logger.addHandler(Capture())
        tr._train_epoch(0, 0.0)
        step_lines = [r for r in records if "step" in r and "loss" in r]
        assert len(step_lines) == tr.train_pipe.steps_per_epoch(4)

    def test_zero_disables(self, tmp_path):
        tr, _ = _stub_trainer(tmp_path, log_every_steps=0)
        records = []

        class Capture(logging.Handler):
            def emit(self, record):
                records.append(record.getMessage())

        tr.logger.addHandler(Capture())
        tr._train_epoch(0, 0.0)
        assert not [r for r in records if "step" in r]


# --------------------------- removed knobs ---------------------------


def test_old_configs_with_slice_bucket_still_load():
    d = TrainConfig().to_dict()
    d["eval"]["slice_bucket"] = 8  # key from round-1 configs
    cfg = TrainConfig.from_dict(d)
    assert not hasattr(cfg.eval, "slice_bucket")


# --------------------------- data.task_options ---------------------------


class TestTaskOptions:
    def test_dict_override_coerces_json(self):
        cfg = TrainConfig().override(
            ['data.task_options={"style": "xhard", "num_cases": 3}']
        )
        assert cfg.data.task_options == {"style": "xhard", "num_cases": 3}
        # survives a JSON round trip like every other knob
        again = TrainConfig.from_json(cfg.to_json())
        assert again.data.task_options == cfg.data.task_options

    def test_bad_json_raises(self):
        with pytest.raises(json.JSONDecodeError):
            TrainConfig().override(["data.task_options={style: xhard}"])

    def test_options_reach_the_synthetic_task(self, tmp_path):
        from aide_tpu.data.tasks import build_task

        cfg = TrainConfig().override(
            [
                "data.task=synthetic",
                f"data.root={tmp_path}/d",
                'data.task_options={"style": "hard", "num_cases": 3,'
                ' "slices_per_case": 2, "two_modal": true}',
            ]
        )
        task = build_task(cfg)
        assert task.style == "hard"
        assert task.num_cases == 3
        assert task.slices_per_case == 2
        assert task.two_modal is True


class TestTaskOptionsValidation:
    def test_unknown_synthetic_option_raises(self):
        # data.task_options forwards verbatim into the task constructor; a
        # typo'd knob must fail loudly instead of training with defaults
        with pytest.raises(TypeError, match="noisy_fracton"):
            SyntheticTask(num_cases=2, slices_per_case=2, size=16,
                          noisy_fracton=0.9)

    def test_known_extras_still_accepted(self):
        t = SyntheticTask(num_cases=2, slices_per_case=2, size=16,
                          test_case_offset=100, num_test_cases=3)
        assert t.test_case_offset == 100 and t.num_test_cases == 3

    def test_unknown_option_raises_on_real_tasks(self):
        # the strictness lives in the Task base, so chaos/prostate/kidney/
        # breast reject typos too (not just SyntheticTask)
        from aide_tpu.data.tasks.chaos import ChaosTask

        with pytest.raises(TypeError, match="widnow"):
            ChaosTask(root=".", widnow="max")

    def test_mask_identity_accepted_by_all_tasks(self):
        # build_task passes mask_identity to every task uniformly; only
        # kidney consumes it, the rest must accept-and-ignore
        from aide_tpu.data.tasks.chaos import ChaosTask

        ChaosTask(root=".", mask_identity=2)


class TestConfigFileValidation:
    def test_from_dict_unknown_key_raises(self):
        d = TrainConfig().to_dict()
        d["optim"]["learning_rate"] = 3e-4  # typo for lr
        with pytest.raises(KeyError, match="learning_rate"):
            TrainConfig.from_dict(d)

    def test_from_dict_unknown_top_level_raises(self):
        d = TrainConfig().to_dict()
        d["optimizer"] = {}
        with pytest.raises(KeyError, match="optimizer"):
            TrainConfig.from_dict(d)
