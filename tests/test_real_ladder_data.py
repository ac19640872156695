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


@needs_ref
@pytest.mark.slow
def test_real_dicom_proposed_smoke(tmp_path):
    """The flagship dual-net co-teaching path END TO END on real shipped
    DICOM (VERDICT r4 #4): one tiny epoch of the ladder's aide rung — real
    DICOM decode, pseudo-label seeding, TTA co-teach steps, case eval,
    refresh with the on-disk tempmask mirror — at a smoke-sized operating
    point (64 px, base_width 4). The full-size chip run is
    experiments/chaos_real_ladder.py / chaos_real_ladder_results.json."""
    import chaos_real_ladder as L

    res = L.run_stage(
        "aide", str(tmp_path), epochs=1, img_size=64, base_width=4, batch=4
    )
    assert res["initial_pseudo_quality"] > 0.3  # shipped bootstrap ~0.48
    assert 0.0 <= res["best_case10_dice"] <= 1.0
    # warmup refresh ran and mirrored case 10's working labels to disk in
    # the reference's tempmask convention, OUTSIDE the read-only tree
    track = res["label_quality_track"]
    assert track and 0.0 <= track[0]["label_quality"] <= 1.0
    temp = os.path.join(str(tmp_path), "tempmask_aide")
    assert os.path.isdir(temp)
    names = os.listdir(os.path.join(temp, "10"))
    assert any(n.endswith("_net1.png") for n in names)
