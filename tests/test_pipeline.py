"""Pipeline + LabelStore + task tests (synthetic task; real-format mirrors)."""

import os

import numpy as np
import pytest

from aide_tpu.core.registry import TASKS
from aide_tpu.data import SlicePipeline
from aide_tpu.data.tasks.synthetic import SyntheticTask
from aide_tpu.data.io import read_mask


@pytest.fixture
def task(tmp_path):
    return SyntheticTask(
        root=str(tmp_path), num_cases=3, slices_per_case=4, size=48
    )


@pytest.fixture
def pipe(task):
    specs = task.load_manifest(train=True)
    return SlicePipeline(task, specs, img_size=32, working_labels=True)


class TestPipeline:
    def test_cache_shapes(self, pipe):
        assert pipe.images[0].shape == (12, 32, 32, 3)
        assert pipe.targets.shape == (12, 32, 32)
        assert set(np.unique(pipe.targets)) <= {0, 1}

    def test_per_image_normalization(self, pipe):
        """Images are cached as raw uint8 plus affine coefficients such that
        u8 * scale + fill is ~zero-mean unit-std (applied on device in
        engine/steps.batch_images); fill = (0-mean)/std."""
        assert pipe.images[0].dtype == np.uint8
        img = (
            pipe.images[0][0].astype(np.float32) * pipe.scales[0][0]
            + pipe.fills[0][0]
        )
        assert abs(img.mean()) < 0.05
        assert 0.9 < img.std() < 1.1
        # fill value maps raw 0 to normalized space
        raw_zero = pipe.fills[0][0]
        assert np.all(raw_zero < 0)  # images have positive means

    def test_device_cache_matches_host_batches(self, pipe):
        """to_device(): batches gathered on device are value-identical to
        host-assembled batches, and label refreshes propagate after
        sync_labels_to_device()."""
        idx = [0, 3, 5]
        host = {k: np.asarray(v) for k, v in pipe._batch_from(np.asarray(idx)).items()}
        pipe.to_device()
        dev = pipe.batch_at(idx)
        assert set(dev) == set(host)
        for k in host:
            got = np.asarray(dev[k])
            assert got.dtype == host[k].dtype, k
            assert np.array_equal(got, host[k]), k
        # refresh one case's working labels, then sync
        case = pipe.cases[0]
        idxs = pipe.case_indices(case)
        vol = np.ones((len(idxs), 32, 32), np.uint8)
        pipe.labels.refresh_case(1, idxs, vol, mirror=False)
        stale = np.asarray(pipe.batch_at([idxs[0]])["target1"])
        pipe.sync_labels_to_device()
        fresh = np.asarray(pipe.batch_at([idxs[0]])["target1"])
        assert fresh.sum() == 32 * 32
        assert stale.sum() != fresh.sum() or (stale == 1).all()

    def test_decode_cache_roundtrip(self, task, tmp_path):
        """Second construction with the same cache_dir loads the npz and
        never calls task.decode; arrays are identical."""
        specs = task.load_manifest(train=True)
        cache = str(tmp_path / "decode_cache")
        p1 = SlicePipeline(task, specs, img_size=32, cache_dir=cache)
        assert os.listdir(cache)

        def boom(spec):  # decode must not be called on a warm load
            raise AssertionError("decode called despite cache")

        task.decode = boom
        p2 = SlicePipeline(task, specs, img_size=32, cache_dir=cache)
        assert np.array_equal(p1.images[0], p2.images[0])
        assert np.array_equal(p1.scales[0], p2.scales[0])
        assert np.array_equal(p1.fills[0], p2.fills[0])
        assert np.array_equal(p1.targets, p2.targets)
        assert p1.cases == p2.cases

    def test_decode_cache_keyed_by_task_fingerprint(self, tmp_path):
        """Task-level decode knobs (synthetic generator params, chaos
        window) change decode() output without changing the spec list; the
        warm cache must not serve arrays generated under other settings."""
        from aide_tpu.data.tasks.synthetic import SyntheticTask

        cache = str(tmp_path / "decode_cache")
        kw = dict(num_cases=2, slices_per_case=2, size=24)
        t1 = SyntheticTask(seed=0, **kw)
        p1 = SlicePipeline(
            t1, t1.load_manifest(train=True), img_size=24, cache_dir=cache
        )
        t2 = SyntheticTask(seed=1, **kw)  # same specs, different pixels
        p2 = SlicePipeline(
            t2, t2.load_manifest(train=True), img_size=24, cache_dir=cache
        )
        assert not np.array_equal(p1.images[0], p2.images[0])

    def test_fixed_normalization(self, task):
        specs = task.load_manifest(train=True)
        p = SlicePipeline(
            task, specs, img_size=32, data_mean=(0.5, 0.5, 0.5),
            data_std=(0.25, 0.25, 0.25),
        )
        assert np.allclose(p.fills[0], -2.0)

    def test_batches_shapes_and_droplast(self, pipe):
        batches = list(pipe.batches(5, rng=np.random.default_rng(0)))
        assert len(batches) == 2  # 12 // 5
        b = batches[0]
        assert b["image"].shape == (5, 32, 32, 3)
        assert b["target1"].shape == (5, 32, 32)
        assert b["target"].dtype == np.int32

    def test_shuffle_deterministic(self, pipe):
        a = [b["target"].sum() for b in pipe.batches(4, np.random.default_rng(7))]
        b = [b["target"].sum() for b in pipe.batches(4, np.random.default_rng(7))]
        c = [b["target"].sum() for b in pipe.batches(4, np.random.default_rng(8))]
        assert a == b
        assert a != c

    def test_case_grouping_sorted(self, pipe):
        assert pipe.cases == ["case00", "case01", "case02"]
        idxs = pipe.case_indices("case01")
        assert len(idxs) == 4
        keys = [pipe.specs[i].sort_key for i in idxs]
        assert keys == sorted(keys)

    def test_batch_at_images_only_skips_labels(self, pipe):
        """Predict-only batches carry no target/working-label arrays (the
        predict step never reads them; see case_eval.infer_cases)."""
        idxs = pipe.case_indices("case00")[:2]
        full = pipe.batch_at(idxs)
        pred = pipe.batch_at(idxs, images_only=True)
        assert any(k.startswith("target") for k in full)
        assert not any(k.startswith("target") for k in pred)
        for k in pred:
            assert np.array_equal(np.asarray(pred[k]), np.asarray(full[k]))


class TestLabelStore:
    def test_initialized_from_targets(self, pipe):
        assert np.array_equal(pipe.labels.get(1), pipe.targets)
        assert np.array_equal(pipe.labels.get(2), pipe.targets)

    def test_refresh_updates_ram_and_disk(self, pipe, task):
        idxs = pipe.case_indices("case00")
        new = np.ones((len(idxs), 32, 32), np.uint8)
        pipe.labels.refresh_case(1, idxs, new)
        assert pipe.labels.get(1)[idxs[0]].min() == 1
        # net 2 untouched
        assert not np.array_equal(pipe.labels.get(2)[idxs[0]], new[0])
        # disk mirror exists with the task's naming convention
        p = task.tempmask_path(pipe.specs[idxs[0]], 1)
        assert os.path.exists(p)
        assert read_mask(p).max() == 255

    def test_disk_labels_survive_reload(self, pipe, task):
        idxs = pipe.case_indices("case02")
        new = np.ones((len(idxs), 32, 32), np.uint8)
        pipe.labels.refresh_case(2, idxs, new)
        # a fresh pipeline (same tempmask root) picks the refreshed labels up
        specs = task.load_manifest(train=True)
        pipe2 = SlicePipeline(task, specs, img_size=32, working_labels=True)
        assert pipe2.labels.get(2)[idxs[0]].min() == 1
        assert pipe2.labels.get(1)[idxs[0]].min() == 0


class TestTaskRegistry:
    def test_all_tasks_registered(self):
        assert {"chaos", "prostate", "kidney", "breast", "synthetic"} <= set(
            TASKS.names()
        )


CHAOS_SPLIT = "/root/reference/inputs_chaos/All_Sets_split"
CHAOS_ROOT = "/root/reference/inputs_chaos/All_Sets"


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(CHAOS_ROOT, "10")),
    reason="shipped CHAOS data not present",
)
class TestChaosReal:
    def test_manifest_and_decode_case10(self):
        """Build a mini-manifest over shipped case 10 and ingest it."""
        import glob
        import pandas as pd

        from aide_tpu.data.tasks.chaos import ChaosTask

        inphase = sorted(
            glob.glob(f"{CHAOS_ROOT}/10/T1DUAL/DICOM_anon/InPhase/*.dcm")
        )[:4]
        rows = []
        for f in inphase:
            rel_in = os.path.relpath(f, CHAOS_ROOT)
            base = os.path.basename(f).split(".")[0]
            series, num = base.split("-")[1], int(base.split("-")[-1])
            rel_out = (
                f"10/T1DUAL/DICOM_anon/OutPhase/IMG-{series}-{num - 1:05d}.dcm"
            )
            rel_mask = f"10/T1DUAL/Ground/{base}.png"
            assert os.path.exists(os.path.join(CHAOS_ROOT, rel_out)), rel_out
            assert os.path.exists(os.path.join(CHAOS_ROOT, rel_mask)), rel_mask
            rows.append((rel_in, rel_out, rel_mask))
        csv = "/tmp/chaos_mini.csv"
        pd.DataFrame(rows, columns=["Inphase", "Outphase", "Mask"]).to_csv(
            csv, index=False
        )

        task = ChaosTask(root=CHAOS_ROOT)
        specs = task.load_manifest(csv, train=False)
        assert all(s.case_id == "10" for s in specs)
        pipe = SlicePipeline(task, specs, img_size=64)
        assert pipe.images[0].shape == (4, 64, 64, 3)
        assert pipe.images[1].shape == (4, 64, 64, 3)
        assert np.isfinite(pipe.images[0]).all()
