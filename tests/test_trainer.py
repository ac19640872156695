"""End-to-end trainer tests on the synthetic task (tiny shapes, few epochs)."""

import os

import numpy as np
import pytest

from aide_tpu.core.config import TrainConfig, ModelConfig
from aide_tpu.data.tasks.synthetic import SyntheticTask
from aide_tpu.engine.trainer import Trainer


def small_cfg(tmp_path, variant="proposed", **kw):
    cfg = TrainConfig()
    cfg.model = ModelConfig(name="unet4", compute_dtype="float32", norm="group")
    cfg.data.task = "synthetic"
    cfg.data.variant = variant
    cfg.data.img_size = 32
    cfg.data.batch_size = 4
    cfg.data.eval_batch_size = 4
    cfg.data.num_tta_views = 2
    cfg.data.rotation_degree = 20.0
    cfg.coteach.warmup_epochs = 2
    cfg.coteach.consistency_weight = 1.0
    cfg.num_epochs = 2
    cfg.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.history_dir = str(tmp_path / "hist")
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def make_trainer(tmp_path, variant="proposed", noisy=0.5, **kw):
    cfg = small_cfg(tmp_path, variant, **kw)
    task = SyntheticTask(
        root=str(tmp_path / "synth"),
        tempmask_folder="tempmasks",
        num_cases=4,
        slices_per_case=4,
        size=32,
        noisy_fraction=noisy,
        seed=3,
    )
    return Trainer(cfg, task=task)


@pytest.mark.slow
class TestProposedTrainer:
    def test_two_epochs_end_to_end(self, tmp_path):
        tr = make_trainer(tmp_path)
        history = tr.run(2)
        assert len(history) == 2
        row = history[-1]
        for key in (
            "train_loss1", "train_loss2", "test_loss1", "traincase_dice1",
            "testcase_dice2",
        ):
            assert np.isfinite(row[key]), key
        # refresh ran during warmup: some tempmask files mirrored to disk
        temp_root = os.path.join(tr.task.root, tr.task.tempmask_folder)
        assert os.path.isdir(temp_root)
        # checkpoints written on a best epoch
        files = os.listdir(tr.cfg.checkpoint_dir)
        assert any("net1_besttraincasedice" in f for f in files)
        assert any("_full" in f for f in files)

    def test_working_labels_change_after_refresh(self, tmp_path):
        tr = make_trainer(tmp_path, noisy=1.0)
        before = tr.train_pipe.labels.get(1).copy()
        tr.run(2)
        after = tr.train_pipe.labels.get(1)
        assert not np.array_equal(before, after)

    def test_labeled_cases_never_rewritten(self, tmp_path):
        tr = make_trainer(tmp_path, noisy=1.0)
        tr.label_cases = set(tr.train_cases)  # everything exempt
        before1 = tr.train_pipe.labels.get(1).copy()
        tr.run(2)
        assert np.array_equal(before1, tr.train_pipe.labels.get(1))


@pytest.mark.slow
class TestComparisonTrainer:
    def test_supervised_end_to_end(self, tmp_path):
        tr = make_trainer(tmp_path, variant="comparison", noisy=0.0)
        history = tr.run(2)
        row = history[-1]
        assert np.isfinite(row["train_loss"])
        assert np.isfinite(row["traincase_dice1"])
        files = os.listdir(tr.cfg.checkpoint_dir)
        assert any("besttraincasedice" in f for f in files)


@pytest.mark.slow
class TestResume:
    def test_warm_start_from_supervised_ckpt(self, tmp_path):
        sup = make_trainer(tmp_path, variant="comparison", noisy=0.0)
        sup.run(1)
        ckpt_path = os.path.join(
            sup.cfg.checkpoint_dir,
            f"{sup.cfg.experiment_name}_besttraincasedice.msgpack",
        )
        assert os.path.exists(ckpt_path)

        tr = make_trainer(
            tmp_path / "resume", variant="proposed", resume_file=ckpt_path
        )
        p = tr.state.params
        import jax

        leaves = jax.tree_util.tree_leaves(p)
        # warm start loads the same weights into both nets, plus tiny
        # symmetry-breaking noise
        assert all(np.allclose(l[0], l[1], atol=0.05) for l in leaves)

    def test_exact_resume_equals_straight_run(self, tmp_path):
        """train 4 epochs straight == train 2, resume, train 2: identical
        history rows and final params (epoch clock, best/gate bookkeeping,
        optimizer moments, and working labels all restored)."""
        import jax

        straight = make_trainer(tmp_path / "straight", num_epochs=4)
        h_straight = straight.run(4)

        part1 = make_trainer(tmp_path, num_epochs=4)
        part1.run(2)
        last = os.path.join(
            part1.cfg.checkpoint_dir,
            f"{part1.cfg.experiment_name}_last_full.msgpack",
        )
        assert os.path.exists(last)

        part2 = make_trainer(tmp_path, num_epochs=4, resume_file=last)
        assert part2.start_epoch == 2
        assert len(part2.history) == 2
        h_resumed = part2.run(4)

        assert len(h_resumed) == 4
        for a, b in zip(h_straight, h_resumed):
            for k in a:
                if k == "time" or k.startswith("time_"):
                    continue
                assert np.isclose(a[k], b[k], rtol=0, atol=0), (k, a[k], b[k])
        for la, lb in zip(
            jax.tree_util.tree_leaves(straight.state.params),
            jax.tree_util.tree_leaves(part2.state.params),
        ):
            assert np.array_equal(np.asarray(la), np.asarray(lb))

    def test_ascending_gate_defers_checkpoint(self, tmp_path):
        tr = make_trainer(
            tmp_path, variant="proposed", ascending_checkpoint_gate=True
        )
        assert tr.ascending is False
        tr.run(1)  # first epoch only records the changepoint
        assert tr.best_dice == 0.0 or tr.ascending


@pytest.mark.slow
class TestDeviceCache:
    def test_device_resident_matches_host_batches(self, tmp_path):
        """data.device_cache=on (HBM-resident dataset, on-device gather)
        must reproduce the host-batch path's history exactly. The fused
        test tail is disabled on the resident trainer so this pins the
        CACHE alone (the fused program is compared separately in
        TestFusedTail, where float reassociation allows only tolerance)."""
        histories = {}
        for mode in ("off", "on"):
            cfg = small_cfg(tmp_path / mode, variant="proposed", num_epochs=2)
            cfg.data.device_cache = mode
            task = SyntheticTask(
                root=str(tmp_path / mode / "synth"),
                tempmask_folder="tempmasks",
                num_cases=4,
                slices_per_case=4,
                size=32,
                noisy_fraction=0.5,
                seed=3,
            )
            tr = Trainer(cfg, task=task)
            assert tr.device_resident == (mode == "on")
            tr.eval_predict_all = None
            histories[mode] = tr.run(2)
        for a, b in zip(histories["off"], histories["on"]):
            for k in a:
                if k == "time" or k.startswith("time_"):
                    continue
                assert np.isclose(a[k], b[k], rtol=0, atol=1e-6), (k, a[k], b[k])


@pytest.mark.slow
class TestFusedTail:
    def test_fused_tail_matches_legacy(self, tmp_path):
        """The fused epoch tail (one eval+predict program for the test set,
        overlapped/chunked train-case re-inference) must reproduce the
        legacy three-pass tail: same refresh decisions and working labels,
        history metrics equal up to float reassociation."""
        histories, labels, logs = {}, {}, {}
        for mode in ("fused", "legacy"):
            cfg = small_cfg(tmp_path / mode, variant="proposed", num_epochs=2)
            # the fused tail is a single-device path (predict_all gating);
            # the virtual 8-device test mesh would disable it
            cfg.mesh.num_devices = 1
            # 6 cases x 6 slices = 36 train slices -> 9 eval-batch-4 index
            # rows, enough that the chunked train-case path actually splits
            # (rows // 4 >= 2); the test set keeps a ragged final batch
            cfg.data.eval_batch_size = 4
            task = SyntheticTask(
                root=str(tmp_path / mode / "synth"),
                tempmask_folder="tempmasks",
                num_cases=6,
                slices_per_case=6,
                num_test_cases=3,  # 18 test slices: 18 % 4 -> ragged batch
                size=32,
                noisy_fraction=0.5,
                seed=3,
            )
            tr = Trainer(cfg, task=task)
            if mode == "legacy":
                tr.eval_predict_all = None
            else:
                assert tr.eval_predict_all is not None
                assert tr._dispatch_fused_test({}) is not None
            histories[mode] = tr.run(2)
            labels[mode] = {n: tr.train_pipe.labels.get(n).copy() for n in (1, 2)}
            logs[mode] = list(tr.refresh_log)
        assert logs["fused"] == logs["legacy"]
        for n in (1, 2):
            np.testing.assert_array_equal(labels["fused"][n], labels["legacy"][n])
        for a, b in zip(histories["legacy"], histories["fused"]):
            assert set(a) == set(b)
            for k in a:
                if k == "time" or k.startswith("time_"):
                    continue
                np.testing.assert_allclose(
                    b[k], a[k], rtol=1e-4, atol=1e-5, err_msg=k
                )

    def test_fused_tail_declines_partial_case_coverage(self, tmp_path):
        """A testcase list not covering the whole test pipe must fall back
        (the fused program derives the batch eval metrics from the packed
        case stream, so partial coverage would change their value)."""
        cfg = small_cfg(tmp_path, variant="proposed")
        cfg.mesh.num_devices = 1
        task = SyntheticTask(
            root=str(tmp_path / "synth"), tempmask_folder="tempmasks",
            num_cases=4, slices_per_case=4, size=32, noisy_fraction=0.5,
            seed=3,
        )
        tr = Trainer(cfg, task=task)
        assert tr._dispatch_fused_test({}) is not None
        tr.test_cases = tr.test_cases[:1]
        assert tr._dispatch_fused_test({}) is None
        row = tr.run_epoch(0)  # legacy fallback still works end to end
        assert np.isfinite(row["test_loss1"])


@pytest.mark.slow
class TestCheckpointFlush:
    def test_best_writes_immediately_end_defers(self, tmp_path):
        """checkpoint_flush='best' (reference behavior) writes files at the
        best epoch itself; 'end' snapshots on device and writes identical
        files only at flush_checkpoints()."""
        files = {}
        for mode in ("best", "end"):
            tr = make_trainer(tmp_path / mode, checkpoint_flush=mode)
            tr.run_epoch(0)  # epoch 0 is always a best epoch
            name = f"{tr.cfg.experiment_name}_net1_besttraincasedice.msgpack"
            path = os.path.join(tr.cfg.checkpoint_dir, name)
            if mode == "best":
                assert os.path.exists(path), "best-mode must write immediately"
            else:
                assert not os.path.exists(path), "end-mode must defer writes"
                tr.flush_checkpoints()
                assert os.path.exists(path)
            with open(path, "rb") as fh:
                files[mode] = fh.read()
        # same training -> byte-identical exports from either mode
        assert files["best"] == files["end"]


@pytest.mark.slow
class TestRunFlushErrorSemantics:
    def test_epoch_failure_still_flushes_and_original_error_propagates(
        self, tmp_path
    ):
        """A mid-run crash must still write history/checkpoints, and the
        ORIGINAL error (not a flush error) must propagate."""
        tr = make_trainer(tmp_path, checkpoint_flush="end")
        tr.run_epoch(0)  # establish a best snapshot on device
        boom = RuntimeError("tunnel dropped")

        def failing_epoch(epoch):
            raise boom

        tr.run_epoch = failing_epoch
        with pytest.raises(RuntimeError, match="tunnel dropped"):
            tr.run(2)
        name = f"{tr.cfg.experiment_name}_net1_besttraincasedice.msgpack"
        assert os.path.exists(os.path.join(tr.cfg.checkpoint_dir, name))

    def test_flush_error_swallowed_only_while_unwinding(self, tmp_path):
        """If the flush itself fails during exception unwinding the original
        error wins; on the success path a flush failure must raise."""
        tr = make_trainer(tmp_path, checkpoint_flush="end")

        def failing_flush():
            raise OSError("disk full")

        tr.flush_checkpoints = failing_flush

        # success path: flush failure surfaces
        with pytest.raises(OSError, match="disk full"):
            tr.run(1)

        # failure path: the run error wins, flush error only logged
        def failing_epoch(epoch):
            raise RuntimeError("step exploded")

        tr2 = make_trainer(tmp_path / "b", checkpoint_flush="end")
        tr2.run_epoch = failing_epoch
        tr2.flush_checkpoints = failing_flush
        with pytest.raises(RuntimeError, match="step exploded"):
            tr2.run(1)


@pytest.mark.slow
def test_comparison_meta_history_includes_best_epoch(tmp_path):
    """The reference's comparison trainers append the epoch's metrics to
    history BEFORE saving (trainchaos_comparison_1case.py:206-230); the
    embedded checkpoint history must therefore contain the best epoch's own
    row."""
    import json

    tr = make_trainer(tmp_path, variant="comparison", noisy=0.0)
    tr.run(2)
    tr.flush_checkpoints()
    dirpath = tr.cfg.checkpoint_dir
    meta_files = [
        f for f in os.listdir(dirpath)
        if f.endswith("besttraincasedice.msgpack.json")
    ]
    assert meta_files, os.listdir(dirpath)
    with open(os.path.join(dirpath, meta_files[0])) as fh:
        meta = json.load(fh)
    hist = meta["history"]
    assert hist, "embedded history must not be empty"
    assert hist[-1]["epoch"] == meta["epoch"]
    assert "test_loss" in hist[-1] or "test_loss1" in hist[-1]


class TestEngagementGuardrail:
    def _traincase(self, tr, vol1, vol2):
        from aide_tpu.evaluation.case_eval import CaseResult

        return {
            0: [CaseResult("c0", 0.5, pred_volume=vol1)],
            1: [CaseResult("c0", 0.5, pred_volume=vol2)],
        }

    def test_engaged_when_nets_agree_at_label_scale(self, tmp_path):
        tr = make_trainer(tmp_path)
        lab_fg = int(np.count_nonzero(tr.train_pipe.labels.get(1)))
        v = np.zeros((4, 32, 32), np.uint8)
        v.reshape(-1)[:lab_fg] = 1  # same fg volume as the labels
        eng = tr._engagement_signals(self._traincase(tr, v, v.copy()))
        assert eng["crossnet_dice"] == 1.0
        assert tr._engagement_verdict(eng)
        assert tr.engagement["engaged"]

    def test_abstain_on_collapsed_predictions(self, tmp_path):
        """Near-empty predictions over nonempty labels (the a->b transfer
        control regime) must fail the check even though two collapsed nets
        trivially agree (empty-vs-empty dice = 1)."""
        tr = make_trainer(tmp_path)
        z = np.zeros((4, 32, 32), np.uint8)
        eng = tr._engagement_signals(self._traincase(tr, z, z.copy()))
        assert eng["crossnet_dice"] == 1.0  # degenerate agreement
        assert eng["fg_ratio1"] == 0.0
        assert not tr._engagement_verdict(eng)
        assert not tr.engagement["engaged"]

    def test_abstain_on_disagreeing_nets(self, tmp_path):
        tr = make_trainer(tmp_path)
        lab_fg = int(np.count_nonzero(tr.train_pipe.labels.get(1)))
        v1 = np.zeros((4, 32, 32), np.uint8)
        v2 = np.zeros((4, 32, 32), np.uint8)
        v1.reshape(-1)[:lab_fg] = 1
        v2.reshape(-1)[lab_fg : 2 * lab_fg] = 1  # disjoint foregrounds
        eng = tr._engagement_signals(self._traincase(tr, v1, v2))
        assert eng["crossnet_dice"] == 0.0
        assert not tr._engagement_verdict(eng)

    def test_structural_half_life_check(self, tmp_path):
        """Label half-life = refreshable cases / rewrites per epoch: the
        shipped 2-case real setup (1 refreshable, 1 rewrite/epoch) must
        fail; the reference's flagship geometry (30/7) must pass."""
        tr = make_trainer(tmp_path)  # 4 cases, none labeled
        assert tr._structural_refresh_check(k=1)  # half-life 4
        assert not tr._structural_warned
        assert not tr._structural_refresh_check(k=4)  # half-life 1
        assert tr._structural_warned
        # a failed structural check forces the ramp-end verdict to abstain
        # even when the (self-referential) signals look healthy
        lab_fg = int(np.count_nonzero(tr.train_pipe.labels.get(1)))
        v = np.zeros((4, 32, 32), np.uint8)
        v.reshape(-1)[:lab_fg] = 1
        eng = tr._engagement_signals(self._traincase(tr, v, v.copy()))
        assert not tr._engagement_verdict(eng)
        assert tr.engagement["structural_ok"] is False

    def test_bootstrap_skill_probe_folds_into_verdict(self, tmp_path):
        """Layer 0: a below-cliff bootstrap skill probe forces abstain even
        when every ramp-end statistical signal is healthy (the a->b
        transfer control: agreement 0.97, retention 0.88, probe 0.107 —
        outcome 0.19 below its own pretrain)."""
        tr = make_trainer(tmp_path)
        lab_fg = int(np.count_nonzero(tr.train_pipe.labels.get(1)))
        v = np.zeros((4, 32, 32), np.uint8)
        v.reshape(-1)[:lab_fg] = 1
        healthy = self._traincase(tr, v, v.copy())
        tr.engagement_probe = {
            "bootstrap_skill1": 0.107, "bootstrap_skill2": 0.11,
        }
        eng = tr._engagement_signals(healthy)
        assert not tr._engagement_verdict(eng)
        assert tr.engagement["engaged"] is False
        assert tr.engagement["bootstrap_skill_ok"] is False
        assert tr.engagement["bootstrap_band"] == "below_cliff"
        assert tr.engagement["bootstrap_skill1"] == 0.107
        # transition band [0.2, 0.35): engaged, but flagged for validation
        # against the pretrain (a->m seed 23 ended -0.049 vs pretrain here)
        tr2 = make_trainer(tmp_path / "ok")
        tr2.engagement_probe = {
            "bootstrap_skill1": 0.31, "bootstrap_skill2": 0.29,
        }
        eng2 = tr2._engagement_signals(self._traincase(tr2, v, v.copy()))
        assert tr2._engagement_verdict(eng2)
        assert tr2.engagement["bootstrap_skill_ok"] is True
        assert tr2.engagement["bootstrap_band"] == "transition"
        # clear of the transition band: no caveat
        tr3 = make_trainer(tmp_path / "clear")
        tr3.engagement_probe = {
            "bootstrap_skill1": 0.5, "bootstrap_skill2": 0.48,
        }
        eng3 = tr3._engagement_signals(self._traincase(tr3, v, v.copy()))
        assert tr3._engagement_verdict(eng3)
        assert tr3.engagement["bootstrap_band"] == "clear"

    @pytest.mark.slow
    def test_bootstrap_skill_probe_runs_pre_training(self, tmp_path):
        """A warm-started dual run with labeled cases measures the probe
        before the first train step; a fresh-init run does not."""
        # single-net pretrain -> checkpoint to warm start from
        pre = make_trainer(tmp_path / "pre", variant="comparison", noisy=0.0)
        pre.run(1)
        pre.flush_checkpoints()
        ckdir = pre.cfg.checkpoint_dir
        ck = [
            os.path.join(ckdir, f) for f in os.listdir(ckdir)
            if f.endswith("besttraincasedice.msgpack")
        ][0]

        cfg = small_cfg(tmp_path / "dual", resume_file=ck)
        task = SyntheticTask(
            root=str(tmp_path / "dual" / "synth"),
            tempmask_folder="tempmasks",
            num_cases=4, slices_per_case=4, size=32,
            noisy_fraction=0.5, clean_cases=2, seed=3,
        )
        tr = Trainer(cfg, task=task)
        # the synthetic protocols patch the exempt set post-construction
        # (experiments/synthetic_aide.py:308) — run() reads it at probe time
        tr.label_cases = set(task.clean_case_ids())
        assert tr.label_cases  # clean cases are the probe's GT anchor
        probed = {}
        orig = tr._train_epoch

        def spy(epoch, rate):
            # the probe must exist BEFORE the first train step
            probed.setdefault("at_first_step", tr.engagement_probe)
            return orig(epoch, rate)

        tr._train_epoch = spy
        tr.run(2)
        probe = probed["at_first_step"]
        assert probe is not None and set(probe) == {
            "bootstrap_skill1", "bootstrap_skill2",
        }
        assert all(0.0 <= v <= 1.0 for v in probe.values())
        # the ramp-end verdict carries the probe fields
        assert tr.engagement["bootstrap_skill1"] == probe["bootstrap_skill1"]
        assert tr.engagement["bootstrap_skill_ok"] == (
            min(probe.values())
            >= cfg.coteach.engagement_min_bootstrap_skill
        )
        # fresh-init run: no probe
        fresh = make_trainer(tmp_path / "fresh")
        fresh.run(1)
        assert fresh.engagement_probe is None

    @pytest.mark.slow
    def test_bootstrap_snapshot_taken_at_first_refresh(self, tmp_path):
        """The fg-ratio / retention reference is the PRE-first-refresh
        labels, so post-hoc self-agreement cannot mask a collapse."""
        tr = make_trainer(tmp_path, noisy=1.0)
        seeded = tr.train_pipe.labels.get(1).copy()
        tr.run(1)  # warmup epoch 0 refreshes
        assert tr._bootstrap_labels is not None
        np.testing.assert_array_equal(tr._bootstrap_labels[1], seeded)
        assert not np.array_equal(
            tr.train_pipe.labels.get(1), seeded
        )  # labels moved, snapshot did not

    @pytest.mark.slow
    def test_verdict_fires_at_end_of_ramp(self, tmp_path):
        """run() emits the verdict at epoch == warmup_epochs and the
        history carries the cross-net agreement signal every epoch."""
        tr = make_trainer(tmp_path)  # warmup_epochs=2
        history = tr.run(2)
        assert tr.engagement is not None
        assert "engaged" in tr.engagement
        assert all("crossnet_dice" in row for row in history)


def test_on_refresh_hook_fires_after_sync(tmp_path):
    """The public observation hook runs once per refresh epoch, after the
    refresh is applied (experiment oracles read the labels it just wrote)."""
    tr = make_trainer(tmp_path)
    seen = []
    tr.on_refresh = lambda epoch: seen.append(epoch)
    tr.run(1)
    assert seen == [0]


def test_run_zero_epochs_is_noop(tmp_path):
    """run(0) must train nothing (regression: `0 or cfg.num_epochs` fell
    through to the full configured run)."""
    tr = make_trainer(tmp_path)
    history = tr.run(0)
    assert history == []
