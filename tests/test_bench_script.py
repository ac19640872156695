"""bench.py contract tests (CPU, tiny synthetic point).

The driver consumes bench.py's single JSON line; its schema is load-bearing
(CLAUDE.md). These tests pin the parts that run without a chip: the
eval-volume mode's output keys and sanity of its timing fields.
"""

import json
import sys
import types

import pytest


@pytest.fixture(scope="module")
def bench_mod():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_eval_volume_schema(bench_mod, tmp_path, capsys):
    from aide_tpu.core.config import ModelConfig, TrainConfig

    cfg = TrainConfig()
    cfg.model = ModelConfig(
        name="unet2", compute_dtype="float32", norm="group"
    )
    cfg.data.task = "synthetic"
    cfg.data.variant = "proposed"
    cfg.data.img_size = 32
    cfg.data.batch_size = 4
    cfg.data.eval_batch_size = 8
    cfg.data.num_tta_views = 2
    cfg.checkpoint_dir = str(tmp_path / "ck")
    cfg.history_dir = str(tmp_path / "h")
    cfg.data.decode_cache_dir = ""
    bench_mod.TASK_POINTS["tiny"] = dict(
        model="unet2", img=32, two_modal=False,
        cases=4, slices=3, test_cases=2,
    )
    try:
        trainer = bench_mod.build_trainer(cfg, "tiny")
        rc = bench_mod.eval_volume_bench(
            trainer, cfg, types.SimpleNamespace(task="tiny")
        )
    finally:
        bench_mod.TASK_POINTS.pop("tiny")
    assert rc == 0
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ][-1]
    row = json.loads(line)
    # driver contract: metric/value/unit/vs_baseline always present
    assert row["metric"] == "tiny_eval_volume_seconds"
    assert row["unit"] == "s/volume"
    assert row["value"] > 0 and row["vs_baseline"] > 0
    assert row["value"] == pytest.approx(
        bench_mod.EVAL_VOLUME_BASELINE_S / row["vs_baseline"], rel=0.02
    )
    # dual co-teach point evaluates both nets; batching must not be slower
    # than ~the single-volume latency itself
    assert row["nets_evaluated"] == 2
    assert row["slices_per_volume"] == 3
    assert 0 < row["amortized_volume_seconds"] <= row["value"] * 1.5
