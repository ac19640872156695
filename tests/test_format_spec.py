"""Specification-pinned NIfTI-1 / NRRD fixtures.

The round-trip tests in test_data_io.py exercise reader+writer together; a
shared axis-order or offset mistake would cancel out. These tests build the
files BYTE BY BYTE from the format specifications (nifti1.h field offsets;
the NRRD0004 header grammar) so the readers are pinned to what SimpleITK
would produce/consume — the contract the reference relies on
(/root/reference/datasetkidney_comparison/dataset.py:28-46,
/root/reference/datasetprostate_comparison/dataset.py:21-26).
"""

import gzip
import struct

import numpy as np
import pytest

from aide_tpu.data.io.nifti import read_nifti
from aide_tpu.data.io.nrrd import read_nrrd


def _value(x, y, z):
    # distinctive per-voxel value (mixed radix, fits uint8 for the 3x2x4
    # fixtures) so axis-order mistakes can't cancel
    return 36 * z + 6 * y + x


def _xyz_payload(nx, ny, nz, dtype, end="<"):
    """Data blob in the on-disk NIfTI/NRRD convention: x fastest."""
    out = []
    for z in range(nz):
        for y in range(ny):
            for x in range(nx):
                out.append(_value(x, y, z))
    return np.asarray(out, dtype=np.dtype(dtype).newbyteorder(end)).tobytes()


def _nifti_bytes(nx, ny, nz, *, end="<", datatype=4, bitpix=16,
                 vox_offset=352.0, scl_slope=0.0, scl_inter=0.0,
                 dtype=np.int16, magic=b"n+1\x00"):
    """Assemble a NIfTI-1 file from the nifti1.h field offsets directly."""
    hdr = bytearray(348)
    struct.pack_into(end + "i", hdr, 0, 348)              # sizeof_hdr
    dim = [3, nx, ny, nz, 1, 1, 1, 1]
    struct.pack_into(end + "8h", hdr, 40, *dim)           # dim[8]
    struct.pack_into(end + "h", hdr, 70, datatype)        # datatype
    struct.pack_into(end + "h", hdr, 72, bitpix)          # bitpix
    struct.pack_into(end + "8f", hdr, 76, 1, 1, 1, 1, 0, 0, 0, 0)  # pixdim
    struct.pack_into(end + "f", hdr, 108, vox_offset)     # vox_offset
    struct.pack_into(end + "f", hdr, 112, scl_slope)      # scl_slope
    struct.pack_into(end + "f", hdr, 116, scl_inter)      # scl_inter
    hdr[344:348] = magic
    pad = b"\x00" * (int(vox_offset) - 348)
    return bytes(hdr) + pad + _xyz_payload(nx, ny, nz, dtype, end)


class TestNiftiSpec:
    def test_little_endian_int16_axis_order(self, tmp_path):
        p = tmp_path / "v.nii"
        p.write_bytes(_nifti_bytes(3, 2, 4))
        arr = read_nifti(str(p))
        assert arr.shape == (4, 2, 3)  # (z, y, x) like SimpleITK
        assert arr.dtype == np.int16
        for z in range(4):
            for y in range(2):
                for x in range(3):
                    assert arr[z, y, x] == _value(x, y, z)

    def test_big_endian_header_and_data(self, tmp_path):
        p = tmp_path / "be.nii"
        p.write_bytes(_nifti_bytes(3, 2, 4, end=">"))
        arr = read_nifti(str(p))
        assert arr.shape == (4, 2, 3)
        assert arr[3, 1, 2] == _value(2, 1, 3)

    def test_scl_slope_inter_applied(self, tmp_path):
        p = tmp_path / "scl.nii"
        p.write_bytes(_nifti_bytes(3, 2, 4, scl_slope=2.0, scl_inter=-1.0))
        arr = read_nifti(str(p))
        assert arr.dtype == np.float32
        assert arr[1, 1, 2] == pytest.approx(2.0 * _value(2, 1, 1) - 1.0)

    def test_gzip_container(self, tmp_path):
        p = tmp_path / "v.nii.gz"
        p.write_bytes(gzip.compress(_nifti_bytes(3, 2, 4)))
        arr = read_nifti(str(p))
        assert arr[2, 0, 1] == _value(1, 0, 2)

    def test_nonstandard_vox_offset(self, tmp_path):
        # extension blobs push vox_offset past 352; reader must honor it
        p = tmp_path / "ext.nii"
        p.write_bytes(_nifti_bytes(3, 2, 4, vox_offset=368.0))
        arr = read_nifti(str(p))
        assert arr[0, 1, 0] == _value(0, 1, 0)

    def test_uint8_datatype(self, tmp_path):
        p = tmp_path / "u8.nii"
        p.write_bytes(_nifti_bytes(3, 2, 4, datatype=2, bitpix=8,
                                   dtype=np.uint8))
        arr = read_nifti(str(p))
        assert arr.dtype == np.uint8
        assert arr[3, 0, 2] == _value(2, 0, 3)

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "bad.nii"
        p.write_bytes(_nifti_bytes(3, 2, 4, magic=b"xx1\x00"))
        with pytest.raises(ValueError, match="magic"):
            read_nifti(str(p))

    def test_nan_slope_means_no_scaling(self, tmp_path):
        # many tools write scl_slope=NaN for "no scaling"; the volume must
        # come back untouched, not all-NaN
        p = tmp_path / "nan.nii"
        p.write_bytes(
            _nifti_bytes(3, 2, 4, scl_slope=float("nan"), scl_inter=float("nan"))
        )
        arr = read_nifti(str(p))
        assert np.isfinite(arr).all()
        assert arr[1, 1, 2] == _value(2, 1, 1)


class TestNrrdSpec:
    def _hdr(self, lines):
        return ("\n".join(lines) + "\n\n").encode()

    def test_raw_little_endian_short(self, tmp_path):
        hdr = self._hdr([
            "NRRD0004",
            "# SimpleITK-style comment line",
            "type: short",
            "dimension: 3",
            "space: left-posterior-superior",
            "sizes: 3 2 4",
            "space directions: (1,0,0) (0,1,0) (0,0,1)",
            "kinds: domain domain domain",
            "endian: little",
            "encoding: raw",
            "space origin: (0,0,0)",
        ])
        p = tmp_path / "v.nrrd"
        p.write_bytes(hdr + _xyz_payload(3, 2, 4, np.int16))
        arr, meta = read_nrrd(str(p))
        assert arr.shape == (4, 2, 3)  # sizes are x-fastest; we return (z,y,x)
        assert meta["type"] == "short"
        for z in range(4):
            for y in range(2):
                for x in range(3):
                    assert arr[z, y, x] == _value(x, y, z)

    def test_gzip_encoding(self, tmp_path):
        hdr = self._hdr([
            "NRRD0004", "type: unsigned char", "dimension: 3",
            "sizes: 3 2 4", "encoding: gzip",
        ])
        p = tmp_path / "g.nrrd"
        p.write_bytes(hdr + gzip.compress(_xyz_payload(3, 2, 4, np.uint8)))
        arr, _ = read_nrrd(str(p))
        assert arr.dtype == np.uint8
        assert arr[1, 1, 1] == _value(1, 1, 1)

    def test_big_endian_payload(self, tmp_path):
        hdr = self._hdr([
            "NRRD0004", "type: short", "dimension: 3",
            "sizes: 3 2 4", "endian: big", "encoding: raw",
        ])
        p = tmp_path / "be.nrrd"
        p.write_bytes(hdr + _xyz_payload(3, 2, 4, np.int16, end=">"))
        arr, _ = read_nrrd(str(p))
        assert arr[3, 1, 2] == _value(2, 1, 3)

    def test_crlf_header_lines(self, tmp_path):
        # teem tools may emit \r\n; the blank terminator line is then "\r"
        hdr = ("NRRD0004\r\ntype: uchar\r\ndimension: 3\r\n"
               "sizes: 3 2 4\r\nencoding: raw\r\n\r\n").encode()
        p = tmp_path / "crlf.nrrd"
        p.write_bytes(hdr + _xyz_payload(3, 2, 4, np.uint8))
        arr, _ = read_nrrd(str(p))
        assert arr.shape == (4, 2, 3)
        assert arr[2, 1, 0] == _value(0, 1, 2)

    def test_float_volume(self, tmp_path):
        hdr = self._hdr([
            "NRRD0004", "type: float", "dimension: 3",
            "sizes: 3 2 4", "endian: little", "encoding: raw",
        ])
        p = tmp_path / "f.nrrd"
        p.write_bytes(hdr + _xyz_payload(3, 2, 4, np.float32))
        arr, _ = read_nrrd(str(p))
        assert arr.dtype == np.float32
        assert arr[0, 0, 2] == _value(2, 0, 0)

    def test_not_nrrd_rejected(self, tmp_path):
        p = tmp_path / "x.nrrd"
        p.write_bytes(b"PNG\n\n")
        with pytest.raises(ValueError, match="not an NRRD"):
            read_nrrd(str(p))


# ------------------------------ DICOM ------------------------------


def _dicom_element_explicit(group, elem, vr, value):
    out = struct.pack("<HH", group, elem) + vr
    if vr in (b"OB", b"OW", b"UN", b"SQ", b"UT"):
        return out + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return out + struct.pack("<H", len(value)) + value


def _dicom_element_implicit(group, elem, value):
    return struct.pack("<HHI", group, elem, len(value)) + value


def _implicit_vr_dicom(rows=4, cols=3):
    """Implicit-VR little-endian part-10 file built from PS3.5: the file
    meta group stays explicit VR; the dataset carries no VR bytes, so the
    reader must take binary VRs (US) from its data dictionary."""
    ts = b"1.2.840.10008.1.2\x00"  # implicit VR LE, padded even
    meta = _dicom_element_explicit(0x0002, 0x0010, b"UI", ts)
    pixels = np.arange(rows * cols, dtype=np.uint16) * 7
    body = b"".join(
        [
            _dicom_element_implicit(0x0028, 0x0002, struct.pack("<H", 1)),
            _dicom_element_implicit(0x0028, 0x0010, struct.pack("<H", rows)),
            _dicom_element_implicit(0x0028, 0x0011, struct.pack("<H", cols)),
            _dicom_element_implicit(0x0028, 0x0100, struct.pack("<H", 16)),
            _dicom_element_implicit(0x0028, 0x0103, struct.pack("<H", 0)),
            _dicom_element_implicit(0x0028, 0x0030, b"1.5\\1.5 "),
            _dicom_element_implicit(0x0028, 0x1053, b"2.0 "),
            _dicom_element_implicit(0x0028, 0x1052, b"-1.0"),
            _dicom_element_implicit(0x7FE0, 0x0010, pixels.tobytes()),
        ]
    )
    return b"\x00" * 128 + b"DICM" + meta + body, pixels.reshape(rows, cols)


class TestDicomImplicitVR:
    def test_binary_tags_decode_via_dictionary(self, tmp_path):
        from aide_tpu.data.io.dicom import read_dicom

        blob, expect = _implicit_vr_dicom()
        p = tmp_path / "im.dcm"
        p.write_bytes(blob)
        d = read_dicom(str(p))
        assert d.rows == 4 and d.columns == 3
        assert int(d.tags["BitsAllocated"]) == 16
        assert np.array_equal(d.pixel_array, expect)
        assert d.pixel_spacing == (1.5, 1.5)
        # string VRs (DS) still decode via the fallback
        assert d.rescaled_array[0, 1] == pytest.approx(2.0 * 7 - 1.0)


# ------------------- adversarial-header sweep (VERDICT r3 #6) -------------------


class TestNiftiAdversarial:
    """Malformed/vendor-quirk headers must raise clean ValueErrors or decode
    correctly — never silently hand garbage to the working-label pipeline."""

    def test_vox_offset_into_header_rejected(self, tmp_path):
        blob = bytearray(_nifti_bytes(3, 2, 4))
        struct.pack_into("<f", blob, 108, 100.0)  # points INTO the header
        p = tmp_path / "junkoff.nii"
        p.write_bytes(bytes(blob))
        with pytest.raises(ValueError, match="vox_offset"):
            read_nifti(str(p))

    @pytest.mark.parametrize("off", [348.0, 350.0, 351.0, -4.0])
    def test_extension_indicator_offsets_rejected(self, tmp_path, off):
        # 348..351 point at the 4-byte extension-indicator field (single-file
        # minimum is 352); negatives must hit the reader's contract error,
        # not numpy's generic one
        blob = bytearray(_nifti_bytes(3, 2, 4))
        struct.pack_into("<f", blob, 108, off)
        p = tmp_path / "extoff.nii"
        p.write_bytes(bytes(blob))
        with pytest.raises(ValueError, match="vox_offset"):
            read_nifti(str(p))

    def test_nan_vox_offset_rejected(self, tmp_path):
        blob = bytearray(_nifti_bytes(3, 2, 4))
        struct.pack_into("<f", blob, 108, float("nan"))
        p = tmp_path / "nanoff.nii"
        p.write_bytes(bytes(blob))
        with pytest.raises(ValueError, match="vox_offset"):
            read_nifti(str(p))

    @pytest.mark.parametrize("dim0,dims", [(0, None), (8, None),
                                           (3, (3, -2, 4)), (3, (0, 2, 4))])
    def test_bad_dims_rejected(self, tmp_path, dim0, dims):
        blob = bytearray(_nifti_bytes(3, 2, 4))
        d = [dim0] + list(dims or (3, 2, 4)) + [1, 1, 1, 1]
        struct.pack_into("<8h", blob, 40, *d)
        p = tmp_path / "baddim.nii"
        p.write_bytes(bytes(blob))
        with pytest.raises(ValueError, match="dim"):
            read_nifti(str(p))

    def test_payload_shorter_than_dims_rejected(self, tmp_path):
        blob = _nifti_bytes(3, 2, 4)
        p = tmp_path / "short.nii"
        p.write_bytes(blob[:-10])
        with pytest.raises(ValueError, match="truncated"):
            read_nifti(str(p))

    def test_midstream_gzip_truncation_rejected(self, tmp_path):
        import gzip as _gz

        whole = _gz.compress(_nifti_bytes(3, 2, 4))
        p = tmp_path / "cut.nii.gz"
        p.write_bytes(whole[: len(whole) // 2])
        with pytest.raises(ValueError, match="gzip"):
            read_nifti(str(p))

    def test_corrupt_deflate_body_rejected(self, tmp_path):
        # bit-rot INSIDE the deflate stream raises zlib.error, which is
        # neither OSError nor EOFError — it must still surface as the
        # reader contract's clean ValueError
        import gzip as _gz

        whole = bytearray(_gz.compress(_nifti_bytes(3, 2, 4)))
        for i in range(20, min(60, len(whole) - 9)):
            whole[i] ^= 0xA5  # trash deflate data, keep the gzip magic
        p = tmp_path / "rot.nii.gz"
        p.write_bytes(bytes(whole))
        with pytest.raises(ValueError, match="gzip"):
            read_nifti(str(p))

    def test_orientation_codes_ignored_like_simpleitk(self, tmp_path):
        """The reference reads volumes via GetArrayFromImage — INDEX order,
        no reorientation. Non-axial qform/sform metadata must not change
        (or crash) the decode."""
        base = read_nifti_bytes = _nifti_bytes(3, 2, 4)
        blob = bytearray(read_nifti_bytes)
        struct.pack_into("<h", blob, 252, 1)   # qform_code
        struct.pack_into("<h", blob, 254, 2)   # sform_code
        struct.pack_into("<6f", blob, 256, 0.7, 0.1, -0.7, 12.0, -30.0, 4.4)
        # srow_x/y/z: an oblique direction matrix
        struct.pack_into("<12f", blob, 280,
                         0.0, -1.0, 0.0, 10.0,
                         0.9, 0.0, 0.44, -5.0,
                         0.0, 0.0, -1.0, 2.0)
        pa = tmp_path / "plain.nii"
        pb = tmp_path / "oblique.nii"
        pa.write_bytes(base)
        pb.write_bytes(bytes(blob))
        np.testing.assert_array_equal(read_nifti(str(pa)), read_nifti(str(pb)))

    def test_byte_fuzz_never_escapes_valueerror(self, tmp_path):
        """Seeded single/multi-byte mutations over the whole file: the
        reader either decodes (shape-checked) or raises ValueError — no
        other exception type, no silent wrong-shape array."""
        base = _nifti_bytes(3, 2, 4)
        rng = np.random.default_rng(1234)
        p = tmp_path / "fuzz.nii"
        for trial in range(300):
            blob = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                pos = int(rng.integers(0, len(blob)))
                blob[pos] = int(rng.integers(0, 256))
            p.write_bytes(bytes(blob))
            try:
                arr = read_nifti(str(p))
            except ValueError:
                continue
            assert arr.ndim >= 1 and arr.size > 0


class TestNrrdAdversarial:
    def _hdr(self, lines):
        return ("\n".join(lines) + "\n\n").encode()

    def test_detached_data_file_rejected(self, tmp_path):
        hdr = self._hdr([
            "NRRD0004", "type: short", "dimension: 3", "sizes: 3 2 4",
            "encoding: raw", "data file: ./volume.raw",
        ])
        p = tmp_path / "det.nrrd"
        p.write_bytes(hdr)
        with pytest.raises(ValueError, match="detached"):
            read_nrrd(str(p))

    def test_line_skip_rejected(self, tmp_path):
        hdr = self._hdr([
            "NRRD0004", "type: uchar", "dimension: 3", "sizes: 3 2 4",
            "encoding: raw", "line skip: 2",
        ])
        p = tmp_path / "ls.nrrd"
        p.write_bytes(hdr + _xyz_payload(3, 2, 4, np.uint8))
        with pytest.raises(ValueError, match="line skip"):
            read_nrrd(str(p))

    def test_byte_skip_honored(self, tmp_path):
        hdr = self._hdr([
            "NRRD0004", "type: uchar", "dimension: 3", "sizes: 3 2 4",
            "encoding: raw", "byte skip: 5",
        ])
        p = tmp_path / "bs.nrrd"
        p.write_bytes(hdr + b"JUNK!" + _xyz_payload(3, 2, 4, np.uint8))
        arr, _ = read_nrrd(str(p))
        assert arr[1, 1, 1] == _value(1, 1, 1)

    def test_byte_skip_minus_one_reads_tail(self, tmp_path):
        hdr = self._hdr([
            "NRRD0004", "type: uchar", "dimension: 3", "sizes: 3 2 4",
            "encoding: raw", "byte skip: -1",
        ])
        p = tmp_path / "bsm1.nrrd"
        p.write_bytes(hdr + b"\x00" * 17 + _xyz_payload(3, 2, 4, np.uint8))
        arr, _ = read_nrrd(str(p))
        assert arr[3, 1, 2] == _value(2, 1, 3)

    def test_byte_skip_before_gzip(self, tmp_path):
        import gzip as _gz

        hdr = self._hdr([
            "NRRD0004", "type: uchar", "dimension: 3", "sizes: 3 2 4",
            "encoding: gzip", "byte skip: 3",
        ])
        p = tmp_path / "bsgz.nrrd"
        p.write_bytes(hdr + b"xyz" + _gz.compress(_xyz_payload(3, 2, 4, np.uint8)))
        arr, _ = read_nrrd(str(p))
        assert arr[0, 1, 2] == _value(2, 1, 0)

    def test_missing_sizes_rejected(self, tmp_path):
        hdr = self._hdr(["NRRD0004", "type: uchar", "encoding: raw"])
        p = tmp_path / "nosizes.nrrd"
        p.write_bytes(hdr + b"\x00" * 24)
        with pytest.raises(ValueError, match="sizes"):
            read_nrrd(str(p))

    def test_nonpositive_sizes_rejected(self, tmp_path):
        hdr = self._hdr([
            "NRRD0004", "type: uchar", "dimension: 3",
            "sizes: 3 -2 4", "encoding: raw",
        ])
        p = tmp_path / "negsz.nrrd"
        p.write_bytes(hdr + b"\x00" * 24)
        with pytest.raises(ValueError, match="sizes"):
            read_nrrd(str(p))

    def test_block_type_rejected(self, tmp_path):
        hdr = self._hdr([
            "NRRD0004", "type: block", "block size: 12",
            "dimension: 3", "sizes: 3 2 4", "encoding: raw",
        ])
        p = tmp_path / "blk.nrrd"
        p.write_bytes(hdr + b"\x00" * 288)
        with pytest.raises(ValueError, match="type"):
            read_nrrd(str(p))

    def test_midstream_gzip_truncation_rejected(self, tmp_path):
        import gzip as _gz

        hdr = self._hdr([
            "NRRD0004", "type: short", "dimension: 3", "sizes: 3 2 4",
            "encoding: gzip",
        ])
        gz = _gz.compress(_xyz_payload(3, 2, 4, np.int16))
        p = tmp_path / "cutgz.nrrd"
        p.write_bytes(hdr + gz[: len(gz) // 2])
        with pytest.raises(ValueError, match="gzip"):
            read_nrrd(str(p))

    def test_short_raw_payload_rejected(self, tmp_path):
        hdr = self._hdr([
            "NRRD0004", "type: short", "dimension: 3", "sizes: 3 2 4",
            "encoding: raw",
        ])
        p = tmp_path / "shortraw.nrrd"
        p.write_bytes(hdr + _xyz_payload(3, 2, 4, np.int16)[:-6])
        with pytest.raises(ValueError, match="truncated"):
            read_nrrd(str(p))

    def test_byte_fuzz_never_escapes_valueerror(self, tmp_path):
        hdr = self._hdr([
            "NRRD0004", "type: short", "dimension: 3", "sizes: 3 2 4",
            "endian: little", "encoding: raw",
        ])
        base = hdr + _xyz_payload(3, 2, 4, np.int16)
        rng = np.random.default_rng(99)
        p = tmp_path / "fuzz.nrrd"
        for trial in range(300):
            blob = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                pos = int(rng.integers(0, len(blob)))
                blob[pos] = int(rng.integers(0, 256))
            p.write_bytes(bytes(blob))
            try:
                arr, _ = read_nrrd(str(p))
            except ValueError:
                continue
            assert arr.size > 0


class TestDicomAdversarial:
    def test_multiframe_rejected(self, tmp_path):
        from aide_tpu.data.io.dicom import read_dicom

        ts = b"1.2.840.10008.1.2\x00"
        meta = _dicom_element_explicit(0x0002, 0x0010, b"UI", ts)
        pixels = np.arange(24, dtype=np.uint16)
        body = b"".join([
            _dicom_element_implicit(0x0028, 0x0010, struct.pack("<H", 4)),
            _dicom_element_implicit(0x0028, 0x0011, struct.pack("<H", 3)),
            _dicom_element_implicit(0x0028, 0x0100, struct.pack("<H", 16)),
            _dicom_element_implicit(0x0028, 0x0103, struct.pack("<H", 0)),
            _dicom_element_implicit(0x0028, 0x0008, b"2 "),  # NumberOfFrames
            _dicom_element_implicit(0x7FE0, 0x0010, pixels.tobytes()),
        ])
        p = tmp_path / "mf.dcm"
        p.write_bytes(b"\x00" * 128 + b"DICM" + meta + body)
        with pytest.raises(ValueError, match="NumberOfFrames"):
            read_dicom(str(p)).pixel_array  # noqa: B018

    def test_truncated_element_rejected(self, tmp_path):
        from aide_tpu.data.io.dicom import read_dicom

        blob, _ = _implicit_vr_dicom()
        p = tmp_path / "cut.dcm"
        p.write_bytes(blob[:-7])   # cut into the PixelData value
        with pytest.raises(ValueError, match="truncated"):
            read_dicom(str(p))

    def test_byte_fuzz_never_hangs_or_escapes(self, tmp_path):
        """Mutated DICOMs must fail with a clean parse/shape error (or
        decode) — specifically never struct.error, UnicodeDecodeError, or an
        unbounded loop."""
        from aide_tpu.data.io.dicom import read_dicom

        base, _ = _implicit_vr_dicom()
        rng = np.random.default_rng(4321)
        p = tmp_path / "fuzz.dcm"
        for trial in range(300):
            blob = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                pos = int(rng.integers(0, len(blob)))
                blob[pos] = int(rng.integers(0, 256))
            p.write_bytes(bytes(blob))
            try:
                d = read_dicom(str(p))
                arr = d.pixel_array
            except (ValueError, KeyError, TypeError):
                continue
            assert arr.shape == (d.rows, d.columns)
