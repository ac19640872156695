"""Regression: label refresh IMPROVES working-label quality.

Round-1 finding (experiments/RESULTS.md): refresh without a clean anchor
degrades labels by confirmation bias (0.79 -> 0.74). With the reference's
protocol — clean-case exemption + a clean-anchored warm start
(trainchaos_proposed_30cases1labeled.py:528-575, labeled-case exemption at
:535) — refreshed working labels must end up closer to the oracle ground
truth than the corrupted labels they started from. This pins that property.
"""

import os

import numpy as np
import pytest

from aide_tpu.core.config import ModelConfig, TrainConfig
from aide_tpu.data.tasks.synthetic import SyntheticTask
from aide_tpu.engine.trainer import Trainer
from aide_tpu.ops.metrics import dice3d


def _cfg(tmp_path, variant, stage, **kw):
    cfg = TrainConfig()
    cfg.model = ModelConfig(name="unet4", compute_dtype="float32", norm="group")
    cfg.data.task = "synthetic"
    cfg.data.variant = variant
    cfg.data.img_size = 32
    cfg.data.batch_size = 4
    cfg.data.eval_batch_size = 8
    cfg.data.num_tta_views = 2
    cfg.data.rotation_degree = 20.0
    cfg.data.tempmask_folder = f"tempmasks_{stage}"
    cfg.coteach.warmup_epochs = 8
    cfg.coteach.consistency_weight = 1.0
    cfg.coteach.update_percent = 0.34
    cfg.checkpoint_dir = str(tmp_path / f"ckpt_{stage}")
    cfg.history_dir = str(tmp_path / f"hist_{stage}")
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _task(tmp_path, stage, num_cases, clean_cases):
    return SyntheticTask(
        root=str(tmp_path / f"synth_{stage}"),
        tempmask_folder=f"tempmasks_{stage}",
        num_cases=num_cases,
        slices_per_case=6,
        size=32,
        noisy_fraction=1.0,
        clean_cases=clean_cases,
        noise_shift_divisor=6,
        seed=9,
    )


def _label_quality(pipe, task, net):
    """Mean per-slice Dice of the working labels vs oracle clean masks,
    over the NOISY (non-clean) cases only."""
    labels = pipe.labels.get(net)
    clean_ids = set(task.clean_case_ids())
    dices = []
    for i, spec in enumerate(pipe.specs):
        if spec.case_id in clean_ids:
            continue
        oracle = task.clean_mask(spec)
        dices.append(float(dice3d(labels[i], oracle)))
    return float(np.mean(dices))


@pytest.mark.slow
def test_refresh_improves_working_labels(tmp_path):
    clean, total = 2, 6

    # stage 1: clean-anchored pretrain (supervised on the 2 clean cases)
    pre_task = _task(tmp_path, "pre", clean, clean)
    pre_cfg = _cfg(tmp_path, "comparison", "pre", num_epochs=10)
    pre = Trainer(pre_cfg, task=pre_task)
    pre.run(10)
    warm = os.path.join(
        pre_cfg.checkpoint_dir,
        f"{pre_cfg.experiment_name}_besttraincasedice.msgpack",
    )
    assert os.path.exists(warm)

    # stage 2: AIDE on all cases, 4 of which carry fully corrupted labels
    task = _task(tmp_path, "aide", total, clean)
    cfg = _cfg(
        tmp_path, "proposed", "aide", num_epochs=6, resume_file=warm,
    )
    tr = Trainer(cfg, task=task)
    tr.label_cases = set(task.clean_case_ids())

    before = _label_quality(tr.train_pipe, task, net=1)
    tr.run(6)
    after = max(
        _label_quality(tr.train_pipe, task, net=1),
        _label_quality(tr.train_pipe, task, net=2),
    )
    # corrupted labels start well below 1; the clean-anchored refresh loop
    # must push them TOWARD the oracle, not away (confirmation bias)
    assert before < 0.95
    assert after > before + 0.02, (before, after)
