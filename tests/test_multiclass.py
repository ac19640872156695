"""Multi-class (C > 2) co-teaching end-to-end.

The reference only ships binary heads (SURVEY §2.1); the engine generalizes
to C classes (entropy confidence weightmap ops/tta.py, C-class losses,
argmax-foreground metrics). This exercises num_classes=4 through the full
jitted co-teach step + refresh + case eval."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aide_tpu.core.config import ModelConfig, TrainConfig
from aide_tpu.data.tasks.synthetic import SyntheticTask
from aide_tpu.engine.trainer import Trainer
from aide_tpu.ops import tta


def _task(tmp_path, **kw):
    return SyntheticTask(
        root=str(tmp_path / "synth"),
        tempmask_folder="tempmasks",
        num_cases=4,
        slices_per_case=4,
        size=16,
        num_classes=4,
        noisy_fraction=1.0,
        seed=5,
        **kw,
    )


class TestMulticlassUnits:
    def test_generator_emits_all_classes(self, tmp_path):
        task = _task(tmp_path)
        specs = task.load_manifest(train=True)
        seen = set()
        for spec in specs:
            _, mask = task.decode(spec)[0][0], task.decode(spec)[1]
            seen |= set(np.unique(mask).tolist())
        assert seen == {0, 1, 2, 3}

    def test_tempmask_roundtrip_preserves_labels(self, tmp_path):
        task = _task(tmp_path)
        specs = task.load_manifest(train=True)[:3]
        rng = np.random.default_rng(0)
        vol = rng.integers(0, 4, size=(3, 16, 16)).astype(np.uint8)
        task.write_case_tempmask(specs, vol, net=1)
        back = np.stack([task.read_tempmask(s, 1) for s in specs])
        np.testing.assert_array_equal(back, vol)

    def test_entropy_weightmap_bounds(self, rng):
        probs = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32), axis=-1
        )
        w = tta.confidence_weightmap(probs)
        assert w.shape == (2, 8, 8, 1)
        assert float(w.min()) >= 0.0 and float(w.max()) <= 1.0
        # uniform distribution => zero confidence
        uniform = jnp.full((1, 2, 2, 4), 0.25)
        assert float(tta.confidence_weightmap(uniform).max()) < 1e-5


@pytest.mark.slow
class TestMulticlassCoteachE2E:
    def test_two_epochs(self, tmp_path):
        cfg = TrainConfig()
        cfg.model = ModelConfig(
            name="unet2", num_classes=4, compute_dtype="float32", norm="group"
        )
        cfg.data.task = "synthetic"
        cfg.data.variant = "proposed"
        cfg.data.img_size = 16
        cfg.data.batch_size = 4
        cfg.data.eval_batch_size = 4
        cfg.data.num_tta_views = 2
        cfg.data.rotation_degree = 20.0
        cfg.coteach.warmup_epochs = 2
        cfg.coteach.consistency_weight = 1.0
        cfg.coteach.ceclass_weight = (1.0, 1.0, 1.0, 1.0)
        cfg.coteach.diceclass_weight = (1.0, 1.0, 1.0, 1.0)
        cfg.num_epochs = 2
        cfg.checkpoint_dir = str(tmp_path / "ckpt")
        cfg.history_dir = str(tmp_path / "hist")

        tr = Trainer(cfg, task=_task(tmp_path))
        history = tr.run(2)
        assert len(history) == 2
        for key in ("train_loss1", "train_loss2", "traincase_dice1",
                    "testcase_dice2"):
            assert np.isfinite(history[-1][key]), key

        # refresh mirrored multiclass labels to disk and they survive
        # the PNG round trip with label values intact
        temp_root = os.path.join(tr.task.root, tr.task.tempmask_folder)
        assert os.path.isdir(temp_root)
        labels = tr.train_pipe.labels
        for net in (1, 2):
            assert set(np.unique(labels.get(net)).tolist()) <= {0, 1, 2, 3}

        # the predict path emits 4-class label maps
        batch = tr.train_pipe.batch_at(np.arange(4))
        preds = np.asarray(tr.predict_step(tr.state, batch))
        assert preds.shape == (2, 4, 16, 16)
        assert preds.max() <= 3
