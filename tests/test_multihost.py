"""Multi-host (DCN) data parallelism: two PROCESSES, each with 4 virtual
CPU devices, join one job via `mesh.coordinator_address` and train over the
8-device union — the same code path a TPU pod uses across hosts.

The reference has no distributed runtime at all (SURVEY.md §0). Pins:
- both processes compute identical history rows (the host-side epoch logic
  is deterministic and every fetch is a collective `core/mesh.fetch`);
- the multi-process history matches the single-process 8-device run;
- working labels agree across processes (refresh decisions are identical);
- only process 0 writes checkpoint/history artifacts.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_job_matches_single_process(tmp_path):
    port = _free_port()
    procs = []
    for pid in (0, 1):
        wd = tmp_path / f"proc{pid}"
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        # keep the subprocesses off the parent's persistent compile cache
        # (concurrent writers) — they compile their own tiny programs
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(REPO, "experiments", "multihost_runner.py"),
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", "2",
                    "--process-id", str(pid),
                    "--workdir", str(wd),
                    "--out", str(wd / "result.json"),
                ],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    results = [
        json.load(open(tmp_path / f"proc{pid}" / "result.json"))
        for pid in (0, 1)
    ]
    for r in results:
        assert r["process_count"] == 2
        assert r["global_devices"] == 8
        assert r["local_devices"] == 4
        assert r["mesh_size"] == 8

    # identical decisions and artifacts across processes
    assert results[0]["labels_sha"] == results[1]["labels_sha"]
    for row0, row1 in zip(results[0]["history"], results[1]["history"]):
        for k, v in row0.items():
            np.testing.assert_allclose(row1[k], v, rtol=1e-6, atol=1e-6,
                                       err_msg=k)

    # only the primary wrote files
    assert results[0]["wrote_checkpoints"], "primary wrote no checkpoints"
    assert results[1]["wrote_checkpoints"] == []
    assert (tmp_path / "proc0" / "hist").is_dir()
    hist1 = tmp_path / "proc1" / "hist"
    assert not any(
        f.endswith("_history.json") for f in os.listdir(hist1)
    ) if hist1.is_dir() else True

    # multi-process == single-process (same 8-device math): run the same
    # config in-process on the conftest 8-device mesh
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh for the reference run")
    from aide_tpu.core.config import ModelConfig, TrainConfig
    from aide_tpu.data.tasks.synthetic import SyntheticTask
    from aide_tpu.engine.trainer import Trainer

    cfg = TrainConfig()
    cfg.model = ModelConfig(name="unet2", compute_dtype="float32", norm="batch")
    cfg.data.task = "synthetic"
    cfg.data.variant = "proposed"
    cfg.data.img_size = 16
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.data.num_tta_views = 2
    cfg.coteach.warmup_epochs = 2
    cfg.num_epochs = 2
    cfg.checkpoint_dir = str(tmp_path / "ref" / "ckpt")
    cfg.history_dir = str(tmp_path / "ref" / "hist")
    task = SyntheticTask(
        root=str(tmp_path / "ref" / "synth"),
        tempmask_folder="tempmasks",
        num_cases=4,
        slices_per_case=5,
        size=16,
        noisy_fraction=0.5,
        seed=3,
    )
    ref = Trainer(cfg, task=task).run(2)
    for row_ref, row in zip(ref, results[0]["history"]):
        for k, v in row_ref.items():
            if k.startswith("time"):
                continue
            if "dice" in k:
                assert abs(row[k] - v) < 0.03, (k, v, row[k])
            else:
                np.testing.assert_allclose(row[k], v, rtol=2e-2, atol=2e-3,
                                           err_msg=k)
