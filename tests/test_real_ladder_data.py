"""Data contract of the real-data CHAOS case-10 ladder
(experiments/chaos_real_ladder.py): the shipped pseudo-labels must exist
and align with the clean-GT manifest rows, and the AIDE stage config must
keep the refresh loop alive with only two train cases."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))

REF = "/root/reference/inputs_chaos"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference CHAOS assets not mounted"
)


@needs_ref
def test_csvs_and_pseudo_alignment(tmp_path):
    import pandas as pd

    import chaos_real_ladder as L

    train_csv, val_csv, tc, vc, lc = L.make_csvs(str(tmp_path))
    df = pd.read_csv(train_csv)
    cases = df["Inphase"].str.split("/").str[0].unique().tolist()
    assert sorted(cases) == ["10", "37"]
    # every case-10 row must have a shipped pseudo-label with the same
    # basename (the reference's pseudo CSV convention)
    for m in df[df["Inphase"].str.startswith("10/")]["Mask"]:
        p = os.path.join(L.REF_ROOT, L.PSEUDO_DIR, "10", os.path.basename(m))
        assert os.path.exists(p), p
    assert pd.read_csv(lc)["patient_case"].tolist() == [37]


@needs_ref
def test_aide_cfg_refresh_alive(tmp_path):
    import chaos_real_ladder as L

    cfg = L.build_cfg("aide", str(tmp_path), 4)
    # int(update_percent * 2 train cases) must be >= 1 or refresh never runs
    assert int(cfg.coteach.update_percent * 2) >= 1
    # the disk mirror must stay out of the read-only reference tree
    assert os.path.isabs(cfg.data.tempmask_folder)
    assert not cfg.data.tempmask_folder.startswith("/root/reference")
    assert cfg.data.variant == "proposed"
    naive = L.build_cfg("naive", str(tmp_path), 4)
    assert naive.data.variant == "comparison"
