"""Report emission and synthetic held-out split tests."""

import os

import numpy as np
import pandas as pd

from aide_tpu.evaluation import (
    CaseResult,
    summarize,
    write_case_csv,
    write_case_masks,
    save_comparison_figure,
)
from aide_tpu.data.io import png
from aide_tpu.data.tasks.synthetic import SyntheticTask


class TestReport:
    def test_csv_schema_matches_reference(self, tmp_path):
        results = [
            CaseResult("2", dice=0.8, iou=0.7, tp=10, tn=100, fp=3, fn=2),
            CaseResult("5", dice=0.9, iou=0.85, tp=20, tn=90, fp=1, fn=1),
        ]
        p = str(tmp_path / "out.csv")
        write_case_csv(p, results)
        df = pd.read_csv(p)
        assert list(df.columns) == [
            "Patient_case", "Dice", "IoU", "TP", "TN", "FP", "FN",
        ]
        assert len(df) == 2
        s = summarize(results)
        assert abs(s["mean_dice"] - 0.85) < 1e-9

    def test_mask_emission_fg63(self, tmp_path):
        vol = np.zeros((2, 8, 8), np.uint8)
        vol[0, :2, :2] = 1
        write_case_masks(str(tmp_path), "10", vol, ["IMG-1", "IMG-2"], scale=63)
        m = png.read_mask(str(tmp_path / "10" / "IMG-1.png"))
        assert set(np.unique(m)) == {0, 63}

    def test_comparison_figure(self, tmp_path):
        img = np.random.default_rng(0).random((16, 16)).astype(np.float32)
        mask = (img > 0.5).astype(np.uint8)
        p = str(tmp_path / "fig.png")
        save_comparison_figure(p, img, mask, [mask, 1 - mask], ["net1", "net2"])
        assert os.path.exists(p) and os.path.getsize(p) > 0


class TestSyntheticSplit:
    def test_heldout_test_cases_disjoint(self):
        task = SyntheticTask(
            num_cases=4, slices_per_case=2, size=32,
            test_case_offset=100, num_test_cases=3,
        )
        train = task.load_manifest(train=True)
        test = task.load_manifest(train=False)
        assert {s.case_id for s in train} == {f"case{i:02d}" for i in range(4)}
        assert {s.case_id for s in test} == {"case100", "case101", "case102"}
        # different anatomy
        _, m_train = task.decode(train[0])
        _, m_test = task.decode(test[0])
        assert not np.array_equal(m_train, m_test)

    def test_default_split_preserved(self):
        task = SyntheticTask(num_cases=3, slices_per_case=2, size=32)
        train = task.load_manifest(train=True)
        test = task.load_manifest(train=False)
        assert {s.case_id for s in train} == {s.case_id for s in test}

    def test_noise_shift_divisor_controls_severity(self):
        def quality(div):
            t = SyntheticTask(
                num_cases=6, slices_per_case=4, size=64,
                noisy_fraction=1.0, noise_shift_divisor=div, seed=5,
            )
            specs = t.load_manifest(train=True)
            vals = []
            for s in specs:
                _, noisy = t.decode(s)
                gt = t.clean_mask(s)
                inter = 2 * np.sum((noisy > 0) & (gt > 0))
                u = noisy.sum() + gt.sum()
                vals.append(1.0 if u == 0 else inter / u)
            return np.mean(vals)

        assert quality(4) < quality(16)  # bigger shifts = worse labels
