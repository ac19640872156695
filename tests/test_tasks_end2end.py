"""End-to-end task-loader tests: tiny generated datasets written in each
reference format (NRRD volumes for prostate, NIfTI for kidney/breast) with
proper CSV manifests, run through SlicePipeline and one Trainer epoch."""

import os

import numpy as np
import pandas as pd
import pytest

from aide_tpu.core.config import TrainConfig, ModelConfig
from aide_tpu.data import SlicePipeline
from aide_tpu.data.io import nifti, nrrd, png
from aide_tpu.data.tasks.prostate import ProstateTask
from aide_tpu.data.tasks.kidney import KidneyTask
from aide_tpu.data.tasks.breast import BreastTask


def _vol(seed, s=4, hw=32, binary=False):
    rng = np.random.default_rng(seed)
    v = (rng.random((s, hw, hw)) * 200).astype(np.int16)
    if binary:
        v = (rng.random((s, hw, hw)) > 0.7).astype(np.uint8) * 255
    return v


# ------------------------------ prostate ------------------------------


@pytest.fixture
def prostate_root(tmp_path):
    root = tmp_path / "prostate"
    (root / "vols").mkdir(parents=True)
    rows = []
    for case in ("CaseA", "CaseB"):
        img = _vol(hash(case) % 100, s=4)
        mask = _vol(hash(case) % 100 + 1, s=4, binary=True)
        nrrd.write_nrrd(str(root / "vols" / f"{case}.nrrd"), img)
        nrrd.write_nrrd(str(root / "vols" / f"{case}_mask.nrrd"), mask)
        for d in range(4):
            rows.append((f"vols/{case}.nrrd", f"vols/{case}_mask.nrrd", d))
    csv = root / "train.csv"
    pd.DataFrame(rows, columns=["Image", "Mask", "Depth"]).to_csv(csv, index=False)
    return str(root), str(csv)


class TestProstate:
    def test_pipeline_and_tempmask_roundtrip(self, prostate_root):
        root, csv = prostate_root
        task = ProstateTask(root=root, tempmask_folder="tempmasks")
        specs = task.load_manifest(csv, train=True)
        pipe = SlicePipeline(task, specs, img_size=32, working_labels=True)
        assert len(pipe) == 8
        assert pipe.cases == ["CaseA", "CaseB"]
        # refresh one case -> whole-case volume file in reference convention
        idxs = pipe.case_indices("CaseA")
        newvol = np.ones((4, 32, 32), np.uint8)
        pipe.labels.refresh_case(1, idxs, newvol)
        expect = os.path.join(root, "tempmasks", "CaseA_mask_net1.nrrd")
        assert os.path.exists(expect)
        # fresh pipeline picks it up
        pipe2 = SlicePipeline(
            ProstateTask(root=root, tempmask_folder="tempmasks"),
            task.load_manifest(csv, train=True),
            img_size=32,
            working_labels=True,
        )
        assert pipe2.labels.get(1)[idxs[0]].min() == 1

    def test_tempmask_refresh_at_non_native_img_size(self, prostate_root):
        """Refreshed slices arrive at cfg.data.img_size; the prostate disk
        mirror keeps the NATIVE volume resolution (here 32), so the scatter
        must resize instead of crashing on shape mismatch."""
        root, csv = prostate_root
        task = ProstateTask(root=root, tempmask_folder="tempmasks")
        specs = task.load_manifest(csv, train=True)
        pipe = SlicePipeline(task, specs, img_size=16, working_labels=True)
        idxs = pipe.case_indices("CaseA")
        newvol = np.zeros((4, 16, 16), np.uint8)
        newvol[:, 4:12, 4:12] = 1
        pipe.labels.refresh_case(1, idxs, newvol)
        path = os.path.join(root, "tempmasks", "CaseA_mask_net1.nrrd")
        assert os.path.exists(path)
        native = nrrd.read_nrrd(path)[0]
        assert native.shape == (4, 32, 32)  # written at native resolution
        # center foreground survives the 16 -> 32 -> 16 round trip
        pipe2 = SlicePipeline(
            ProstateTask(root=root, tempmask_folder="tempmasks"),
            task.load_manifest(csv, train=True),
            img_size=16,
            working_labels=True,
        )
        got = pipe2.labels.get(1)[idxs[0]]
        assert got[8, 8] == 1 and got[0, 0] == 0

    def test_max_normalization_floor(self, prostate_root):
        root, csv = prostate_root
        task = ProstateTask(root=root)
        specs = task.load_manifest(csv, train=True)
        imgs, mask = task.decode(specs[0])
        assert imgs[0].max() <= 255.0
        assert imgs[0].min() >= 0.0
        assert set(np.unique(mask)) <= {0, 1}


# ------------------------------- kidney -------------------------------


@pytest.fixture
def kidney_root(tmp_path):
    root = tmp_path / "kidney"
    (root / "imgs").mkdir(parents=True)
    rows = []
    for i in range(4):
        img = _vol(i, s=1)
        nifti.write_nifti(str(root / "imgs" / f"img{i}.nii.gz"), img)
        masks = []
        for a in range(1, 4):
            m = _vol(10 * i + a, s=1, binary=True)
            p = f"imgs/img{i}_seg{a}.nii.gz"
            nifti.write_nifti(str(root / p), m)
            masks.append(p)
        rows.append((f"imgs/img{i}.nii.gz", *masks))
    csv = root / "train.csv"
    pd.DataFrame(rows, columns=["Image", "Mask1", "Mask2", "Mask3"]).to_csv(
        csv, index=False
    )
    return str(root), str(csv)


class TestKidney:
    def test_annotator_selection(self, kidney_root):
        root, csv = kidney_root
        t1 = KidneyTask(root=root, mask_identity=1)
        t2 = KidneyTask(root=root, mask_identity=2)
        s1 = t1.load_manifest(csv, train=True)
        s2 = t2.load_manifest(csv, train=True)
        _, m1 = t1.decode(s1[0])
        _, m2 = t2.decode(s2[0])
        assert not np.array_equal(m1, m2)  # different annotators

    def test_test_mode_majority_vote(self, kidney_root):
        root, csv = kidney_root
        task = KidneyTask(root=root)
        specs = task.load_manifest(csv, train=False)
        _, vote = task.decode(specs[0])
        # vote of three 0/255 masks at (m1+m2+m3)/3 > 0.5 == any annotator
        masks = [
            (nifti.read_nifti(os.path.join(root, p))[0] > 0)
            for p in specs[0].extras["all_masks"]
        ]
        union = (np.mean([m.astype(float) * 255 for m in masks], axis=0) > 0.5)
        assert np.array_equal(vote.astype(bool), union)

    def test_tempmask_nifti_convention(self, kidney_root):
        root, csv = kidney_root
        task = KidneyTask(root=root, tempmask_folder="gen", mask_identity=1)
        specs = task.load_manifest(csv, train=True)
        pipe = SlicePipeline(task, specs, img_size=32, working_labels=True)
        idxs = pipe.case_indices(pipe.cases[0])
        pipe.labels.refresh_case(2, idxs, np.ones((1, 32, 32), np.uint8))
        p = task.tempmask_path(specs[idxs[0]], 2)
        assert p.endswith("_net2.nii.gz") and os.path.exists(p)
        assert (nifti.read_nifti(p) > 0).any()


# ------------------------------- breast -------------------------------


@pytest.fixture
def breast_root(tmp_path):
    root = tmp_path / "breast"
    (root / "vols").mkdir(parents=True)
    rows = []
    # clean case: mask filename contains 'segmentation'
    img = _vol(1, s=3)
    nifti.write_nifti(str(root / "vols" / "caseA.nii.gz"), img)
    nifti.write_nifti(
        str(root / "vols" / "caseA_segmentation.nii.gz"), _vol(2, s=3, binary=True)
    )
    for d in range(3):
        rows.append(("vols/caseA.nii.gz", "vols/caseA_segmentation.nii.gz", d))
    # noisy case: mask path is a per-slice PNG folder
    img = _vol(3, s=3)
    nifti.write_nifti(str(root / "vols" / "caseB.nii.gz"), img)
    folder = root / "noisy" / "caseB"
    folder.mkdir(parents=True)
    for d in range(3):
        m = (np.random.default_rng(d).random((32, 32)) > 0.7).astype(np.uint8)
        png.write_mask(str(folder / f"caseB_depth{d}.png"), m, scale=255)
        rows.append(("vols/caseB.nii.gz", "noisy/caseB", d))
    csv = root / "train.csv"
    pd.DataFrame(rows, columns=["Image", "Mask", "Depth"]).to_csv(csv, index=False)
    return str(root), str(csv)


class TestBreast:
    def test_gt_vs_noisy_detection(self, breast_root):
        root, csv = breast_root
        task = BreastTask(root=root)
        specs = task.load_manifest(csv, train=True)
        assert specs[0].extras["gt"] is True
        assert specs[3].extras["gt"] is False
        assert specs[0].case_id == "caseA"
        assert specs[3].case_id == "caseB"
        for s in (specs[0], specs[3]):
            imgs, mask = task.decode(s)
            assert imgs[0].shape[-1] == 3
            assert set(np.unique(mask)) <= {0, 1}

    def test_tempmask_png_convention(self, breast_root):
        root, csv = breast_root
        task = BreastTask(root=root, tempmask_folder="gen")
        specs = task.load_manifest(csv, train=True)
        pipe = SlicePipeline(task, specs, img_size=32, working_labels=True)
        idxs = pipe.case_indices("caseB")
        pipe.labels.refresh_case(1, idxs, np.ones((3, 32, 32), np.uint8))
        p = task.tempmask_path(specs[idxs[0]], 1)
        assert p.endswith("caseB_depth0_net1.png") and os.path.exists(p)


# -------------------------- trainer on prostate --------------------------


@pytest.mark.slow
def test_prostate_trainer_one_epoch(prostate_root, tmp_path):
    root, csv = prostate_root
    cfg = TrainConfig()
    cfg.model = ModelConfig(name="unet2", compute_dtype="float32", norm="group")
    cfg.data.task = "prostate"
    cfg.data.variant = "proposed"
    cfg.data.root = root
    cfg.data.train_csv = csv
    cfg.data.test_csv = csv
    cfg.data.tempmask_folder = "tempmasks_train"
    cfg.data.img_size = 32
    cfg.data.batch_size = 4
    cfg.data.eval_batch_size = 4
    cfg.data.num_tta_views = 2
    cfg.num_epochs = 1
    cfg.coteach.warmup_epochs = 1
    cfg.coteach.update_percent = 0.5  # 2 cases -> refresh the worst one
    cfg.checkpoint_dir = str(tmp_path / "ck")
    cfg.history_dir = str(tmp_path / "hist")

    from aide_tpu.engine.trainer import Trainer

    tr = Trainer(cfg)
    history = tr.run(1)
    assert np.isfinite(history[0]["train_loss1"])
    # refresh mirrored whole-case NRRD temp volumes
    gen = os.path.join(root, "tempmasks_train")
    assert os.path.isdir(gen) and any(
        f.endswith(".nrrd") for f in os.listdir(gen)
    )


# ----------------------- native prediction output -----------------------


class TestWriteCasePredictions:
    def test_kidney_native_nifti(self, kidney_root, tmp_path):
        """predict output for kidney is per-image .nii.gz (the dataset's
        native mask convention), not PNG."""
        root, csv = kidney_root
        task = KidneyTask(root=root, tempmask_folder="tmp", mask_identity=1)
        specs = task.load_manifest(csv, train=True)
        case = specs[0].case_id
        case_specs = [s for s in specs if s.case_id == case]
        vol = np.ones((len(case_specs), 8, 8), np.uint8)
        out = str(tmp_path / "preds")
        task.write_case_predictions(out, case, case_specs, vol)
        stem = os.path.basename(case_specs[0].image_paths[0]).split(".")[0]
        path = os.path.join(out, str(case), f"{stem}.nii.gz")
        assert os.path.exists(path)
        back = nifti.read_nifti(path)
        assert back.shape[-2:] == (8, 8)
        assert set(np.unique(back)) <= {0, 255}

    def test_prostate_whole_case_volume(self, prostate_root, tmp_path):
        root, csv = prostate_root
        task = ProstateTask(root=root, tempmask_folder="tmp")
        specs = task.load_manifest(csv, train=True)
        case = specs[0].case_id
        case_specs = [s for s in specs if s.case_id == case]
        vol = np.stack(
            [np.full((8, 8), i % 2, np.uint8) for i in range(len(case_specs))]
        )
        out = str(tmp_path / "preds")
        task.write_case_predictions(out, case, case_specs, vol)
        path = os.path.join(out, f"{case}.nii.gz")
        assert os.path.exists(path)
        back = nifti.read_nifti(path)
        assert back.shape[0] == max(s.depth for s in case_specs) + 1
        assert np.array_equal((back[0] > 0).astype(np.uint8), vol[0])


def test_infer_cases_empty_case_list(tmp_path):
    """infer_cases([]) returns [] instead of IndexError on the pad fill."""
    from aide_tpu.evaluation.case_eval import infer_cases

    out = infer_cases(
        predict_step=None, state=None, pipe=None, cases=[], batch_size=4,
        dual=False,
    )
    assert out == []
