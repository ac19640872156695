"""Medical-image IO tests (round trips + real shipped CHAOS DICOMs)."""

import glob
import os

import numpy as np
import pytest

from aide_tpu.data.io import (
    read_dicom,
    read_nifti,
    write_nifti,
    read_nrrd,
    write_nrrd,
    read_mask,
    write_mask,
)

CHAOS_ROOT = "/root/reference/inputs_chaos/All_Sets"
HAVE_CHAOS = os.path.isdir(os.path.join(CHAOS_ROOT, "10"))


@pytest.mark.skipif(not HAVE_CHAOS, reason="shipped CHAOS data not present")
class TestDicomReal:
    def test_reads_inphase_slice(self):
        f = sorted(
            glob.glob(f"{CHAOS_ROOT}/10/T1DUAL/DICOM_anon/InPhase/*.dcm")
        )[0]
        d = read_dicom(f)
        arr = d.pixel_array
        assert arr.shape == (256, 256)
        assert arr.dtype == np.uint16
        assert arr.max() > 0
        assert d.pixel_spacing is not None

    def test_all_case10_slices_parse(self):
        files = glob.glob(f"{CHAOS_ROOT}/10/T1DUAL/DICOM_anon/*/*.dcm")
        assert len(files) > 0
        for f in files:
            d = read_dicom(f)
            assert d.pixel_array.size == d.rows * d.columns

    def test_not_dicom_raises(self, tmp_path):
        p = tmp_path / "junk.dcm"
        p.write_bytes(b"\x00" * 200)
        with pytest.raises(ValueError, match="not a DICOM"):
            read_dicom(str(p))


class TestNifti:
    @pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
    @pytest.mark.parametrize(
        "dtype", [np.uint8, np.int16, np.float32]
    )
    def test_roundtrip(self, tmp_path, suffix, dtype):
        vol = (np.random.default_rng(0).random((4, 6, 5)) * 100).astype(dtype)
        p = str(tmp_path / f"v{suffix}")
        write_nifti(p, vol)
        back = read_nifti(p)
        assert back.shape == vol.shape
        assert np.allclose(back, vol)

    def test_2d_roundtrip(self, tmp_path):
        sl = (np.random.default_rng(1).random((8, 7)) * 255).astype(np.uint8)
        p = str(tmp_path / "s.nii.gz")
        write_nifti(p, sl)
        assert np.array_equal(read_nifti(p), sl)

    def test_bad_file_raises(self, tmp_path):
        p = tmp_path / "bad.nii"
        p.write_bytes(b"x" * 400)
        with pytest.raises(ValueError):
            read_nifti(str(p))


class TestNrrd:
    @pytest.mark.parametrize("encoding", ["raw", "gzip"])
    def test_roundtrip(self, tmp_path, encoding):
        vol = (np.random.default_rng(2).random((3, 5, 4)) * 50).astype(np.int16)
        p = str(tmp_path / "v.nrrd")
        write_nrrd(p, vol, encoding=encoding)
        back, hdr = read_nrrd(p)
        assert np.array_equal(back, vol)
        assert hdr["sizes"] == "4 5 3"  # fastest-first on disk

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "x.nrrd"
        p.write_bytes(b"BOGUS\n\n")
        with pytest.raises(ValueError, match="not an NRRD"):
            read_nrrd(str(p))


class TestPngMask:
    def test_palette_roundtrip(self, tmp_path):
        mask = (np.random.default_rng(3).random((16, 16)) > 0.5).astype(np.uint8)
        p = str(tmp_path / "m.png")
        write_mask(p, mask, scale=63)
        back = read_mask(p)
        assert set(np.unique(back)) <= {0, 63}
        assert np.array_equal((back == 63).astype(np.uint8), mask)


class TestTruncatedInputs:
    """Corrupt/truncated files must raise promptly — never hang, loop, or
    return a silently wrong array."""

    def test_truncated_dicom_raises(self, tmp_path):
        import glob

        srcs = sorted(
            glob.glob(
                "/root/reference/inputs_chaos/All_Sets/*/T1DUAL/DICOM_anon/"
                "InPhase/*.dcm"
            )
        )
        if not srcs:
            pytest.skip("reference DICOMs not present")
        raw = open(srcs[0], "rb").read()
        for frac in (0.1, 0.5, 0.9):
            p = str(tmp_path / f"trunc_{frac}.dcm")
            with open(p, "wb") as fh:
                fh.write(raw[: int(len(raw) * frac)])
            with pytest.raises(Exception):
                read_dicom(p).pixel_array  # noqa: B018

    def test_truncated_nifti_raises(self, tmp_path):
        arr = np.arange(64, dtype=np.int16).reshape(4, 4, 4)
        p = str(tmp_path / "v.nii.gz")
        write_nifti(p, arr)
        import gzip

        raw = gzip.decompress(open(p, "rb").read())
        cut = str(tmp_path / "cut.nii.gz")
        with open(cut, "wb") as fh:
            fh.write(gzip.compress(raw[: len(raw) // 2]))
        with pytest.raises(Exception):
            read_nifti(cut)

    def test_truncated_nrrd_raises(self, tmp_path):
        arr = np.arange(64, dtype=np.int16).reshape(4, 4, 4)
        p = str(tmp_path / "v.nrrd")
        write_nrrd(p, arr)
        raw = open(p, "rb").read()
        cut = str(tmp_path / "cut.nrrd")
        with open(cut, "wb") as fh:
            fh.write(raw[: len(raw) // 2])
        with pytest.raises(Exception):
            read_nrrd(cut)
