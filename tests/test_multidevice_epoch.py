"""Epoch-level multi-device correctness (VERDICT round 2 #3/#4/#5/#6).

The reference's whole-epoch loop runs under single-host DataParallel
(/root/reference/train_files/trainchaos_proposed_30cases1labeled.py:183-186,
245-590). Here the equivalent protocol — train steps, test eval with a
ragged final batch, per-case re-inference, label refresh, checkpointing —
must produce the same numbers on an 8-device mesh as on one device, for
both the sharded device-resident cache (MeshCache) and the host-batch path.
"""

import logging

import jax
import numpy as np
import pytest

from aide_tpu.core.config import ModelConfig, TrainConfig
from aide_tpu.core.mesh import make_mesh
from aide_tpu.data.pipeline import MeshCache
from aide_tpu.data.tasks.synthetic import SyntheticTask
from aide_tpu.engine.trainer import Trainer


needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh (conftest env)"
)


# ------------------------- MeshCache unit tests -------------------------


@needs_mesh
def test_mesh_cache_gather_matches_numpy(rng):
    mesh = make_mesh()
    n, hw = 21, 8  # 21 rows pad to 24 over 8 devices
    data = {
        "image": rng.integers(0, 255, (n, hw, hw, 3)).astype(np.uint8),
        "scale": rng.random((n, 3)).astype(np.float32),
        "target": rng.integers(0, 2, (n, hw, hw)).astype(np.uint8),
    }
    cache = MeshCache(mesh, "data", n)
    dev = cache.put(data)

    for b in (8, 5):  # divisible (sharded out) and ragged (replicated out)
        idx = rng.integers(0, n, b).astype(np.int32)
        out = jax.device_get(cache.gather(dev, idx))
        np.testing.assert_array_equal(out["image"], data["image"][idx])
        np.testing.assert_allclose(out["scale"], data["scale"][idx])
        np.testing.assert_array_equal(out["target"], data["target"][idx].astype(np.int32))
        assert out["target"].dtype == np.int32


@needs_mesh
def test_mesh_cache_scatter_updates_rows(rng):
    mesh = make_mesh()
    n, hw = 19, 8
    labels = rng.integers(0, 2, (n, hw, hw)).astype(np.uint8)
    cache = MeshCache(mesh, "data", n)
    dev = cache.put({"target1": labels})["target1"]

    idx = np.asarray([0, 3, 7, 18], np.int32)
    rows = rng.integers(0, 2, (4, hw, hw)).astype(np.uint8)
    dev = cache.scatter(dev, idx, rows)

    expect = labels.copy()
    expect[idx] = rows
    got = jax.device_get(dev)[: n]
    np.testing.assert_array_equal(got, expect)


# ------------------------- trainer-level tests -------------------------


def _trainer(tmp_path, sub, n_devices, device_cache, batch=8, eval_batch=8,
             logger=None):
    cfg = TrainConfig()
    cfg.model = ModelConfig(name="unet2", compute_dtype="float32", norm="batch")
    cfg.data.task = "synthetic"
    cfg.data.variant = "proposed"
    cfg.data.img_size = 16
    cfg.data.batch_size = batch
    cfg.data.eval_batch_size = eval_batch
    cfg.data.num_tta_views = 2
    cfg.data.rotation_degree = 20.0
    cfg.data.device_cache = device_cache
    cfg.coteach.warmup_epochs = 2
    cfg.coteach.consistency_weight = 1.0
    cfg.num_epochs = 2
    cfg.mesh.num_devices = n_devices
    cfg.checkpoint_dir = str(tmp_path / sub / "ckpt")
    cfg.history_dir = str(tmp_path / sub / "hist")
    # 4 cases x 5 slices = 20 slices: 2 train steps at bs 8 (drop_last) and
    # an 8+8+4 eval stream whose final batch is RAGGED on the 8-device mesh
    task = SyntheticTask(
        root=str(tmp_path / sub / "synth"),
        tempmask_folder="tempmasks",
        num_cases=4,
        slices_per_case=5,
        size=16,
        noisy_fraction=0.5,
        seed=3,
    )
    return Trainer(cfg, task=task, logger=logger)


@needs_mesh
@pytest.mark.slow
def test_epoch_protocol_matches_across_meshes(tmp_path):
    """Two full epochs (train + ragged eval + case re-inference + refresh +
    checkpoint) on: 1 device, 8 devices with the sharded cache, 8 devices
    with host batches. History rows and final BN running stats must agree
    (global-batch semantics survive sharding at epoch length — the GSPMD BN
    story of models/blocks.py)."""
    runs = {
        "one": _trainer(tmp_path, "one", 1, "auto"),
        "mesh": _trainer(tmp_path, "mesh", 8, "auto"),
        "host": _trainer(tmp_path, "host", 8, "off"),
    }
    hist = {}
    for name, tr in runs.items():
        assert tr.mesh.devices.size == (1 if name == "one" else 8)
        assert (tr.train_pipe._mesh_cache is not None) == (name == "mesh")
        hist[name] = tr.run(2)

    ref = hist["one"]
    for name in ("mesh", "host"):
        for row_ref, row in zip(ref, hist[name]):
            for key, v in row_ref.items():
                if key.startswith("time"):
                    continue
                if "dice" in key:
                    assert abs(row[key] - v) < 0.03, (name, key, v, row[key])
                elif "loss" in key:
                    np.testing.assert_allclose(
                        row[key], v, rtol=2e-2, atol=2e-3,
                        err_msg=f"{name}:{key}",
                    )
                else:
                    assert row[key] == v, (name, key)

    # epoch-length BN running stats: 8-device == 1-device
    ref_stats = jax.device_get(runs["one"].state.batch_stats)
    for name in ("mesh", "host"):
        stats = jax.device_get(runs[name].state.batch_stats)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4),
            ref_stats, stats,
        )

    # working labels after refresh agree across placements
    for name in ("mesh", "host"):
        for net in (1, 2):
            np.testing.assert_array_equal(
                runs["one"].train_pipe.labels.get(net),
                runs[name].train_pipe.labels.get(net),
            )


@needs_mesh
def test_mesh_shrink_warns_loudly(tmp_path):
    """engine/trainer fits the mesh to gcd(batch, eval_batch); dropping
    devices must never be silent (VERDICT round 2 #4)."""
    logger = logging.getLogger("test_meshcap")
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    h = Capture(level=logging.WARNING)
    logger.addHandler(h)
    try:
        tr = _trainer(
            tmp_path, "cap", 0, "off", batch=4, eval_batch=8, logger=logger
        )
    finally:
        logger.removeHandler(h)
    assert tr.mesh.devices.size == 4  # gcd(4, 8) on 8 available
    assert any("MESH SHRUNK" in r.getMessage() for r in records)


def test_make_mesh_rejects_overask():
    """Asking for more devices than exist raises a named error, not an
    opaque numpy reshape failure."""
    import pytest
    from aide_tpu.core.config import MeshConfig
    from aide_tpu.core.mesh import make_mesh

    import jax

    too_many = len(jax.devices()) + 1
    with pytest.raises(ValueError, match="num_devices"):
        make_mesh(MeshConfig(num_devices=too_many))


@needs_mesh
def test_mesh_cache_gather_spatial_output(rng):
    """With a space axis, evenly-shaped gathers come back with image H
    sharded over it (from inside the gather program — no resharding
    dispatches in the epoch path), ragged gathers stay replicated, and the
    values match numpy either way."""
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
        ("data", "net", "space"),
    )
    n, hw = 13, 8
    data = {
        "image": rng.integers(0, 255, (n, hw, hw, 3)).astype(np.uint8),
        "scale": rng.random((n, 3)).astype(np.float32),
        "target": rng.integers(0, 2, (n, hw, hw)).astype(np.uint8),
    }
    cache = MeshCache(mesh, "data", n, space_axis="space")
    dev = cache.put(data)

    for b in (4, 5):  # divisible (spatially sharded out) and ragged
        idx = rng.integers(0, n, b).astype(np.int32)
        out = cache.gather(dev, idx)
        img_spec = out["image"].sharding.spec
        if b % 2 == 0:
            assert tuple(img_spec)[:2] == ("data", "space"), img_spec
            assert tuple(out["scale"].sharding.spec) == ("data",)
        else:
            assert all(s is None for s in tuple(img_spec)), img_spec
        host = jax.device_get(out)
        np.testing.assert_array_equal(host["image"], data["image"][idx])
        np.testing.assert_allclose(host["scale"], data["scale"][idx])
        np.testing.assert_array_equal(
            host["target"], data["target"][idx].astype(np.int32)
        )
