"""DICOM / NIfTI minimal-reader tests (round-trips through our writers plus
hand-built golden binary structures)."""

import struct

import numpy as np
import pytest

from dinox_tpu.data.dicom import read_dicom, write_dicom
from dinox_tpu.data.nifti import read_nifti, write_nifti


# -- NIfTI ------------------------------------------------------------------


def test_nifti_roundtrip(tmp_path):
    vol = np.random.default_rng(0).normal(0, 300, (16, 20, 6)).astype(np.float32)
    p = tmp_path / "x.nii.gz"
    write_nifti(p, vol, spacing=(0.7, 0.8, 2.5))
    got = read_nifti(p)
    np.testing.assert_allclose(got.data, vol, atol=1e-5)
    assert got.spacing == pytest.approx((0.7, 0.8, 2.5))
    assert got.n_slices == 6
    np.testing.assert_allclose(got.slice_hu(2), vol[:, :, 2].T, atol=1e-5)


def test_nifti_uncompressed_and_scl(tmp_path):
    """Hand-built header with int16 data + scl_slope/inter rescale."""
    data = np.arange(24, dtype="<i2").reshape(2, 3, 4, order="F")
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, 2, 3, 4, 1, 1, 1, 1)
    struct.pack_into("<2h", hdr, 70, 4, 16)  # int16
    struct.pack_into("<8f", hdr, 76, 0, 1.5, 1.5, 3.0, 0, 0, 0, 0)
    struct.pack_into("<f", hdr, 108, 352.0)
    struct.pack_into("<2f", hdr, 112, 2.0, -10.0)  # slope, inter
    hdr[344:348] = b"n+1\x00"
    p = tmp_path / "golden.nii"
    p.write_bytes(bytes(hdr) + b"\x00" * 4 + data.tobytes(order="F"))
    vol = read_nifti(p)
    np.testing.assert_allclose(vol.data, data.astype(np.float32) * 2.0 - 10.0)
    assert vol.spacing == pytest.approx((1.5, 1.5, 3.0))


def test_nifti_rejects_garbage(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError):
        read_nifti(p)


# -- DICOM ------------------------------------------------------------------


def test_dicom_roundtrip(tmp_path):
    px = np.random.default_rng(1).integers(-1000, 3000, (32, 24)).astype(np.int16)
    p = tmp_path / "s.dcm"
    write_dicom(
        p, px, series_uid="1.2.840.999", patient_id="P42",
        pixel_spacing=(0.6, 0.8), slice_thickness=2.5, position_z=-37.5,
        rescale_slope=1.0, rescale_intercept=-1024.0,
    )
    ds = read_dicom(p)
    assert ds.series_uid == "1.2.840.999"
    assert ds.patient_id == "P42"
    assert ds.pixel_spacing == pytest.approx((0.6, 0.8))
    assert ds.slice_thickness == 2.5
    assert ds.image_position_z == -37.5
    np.testing.assert_array_equal(ds.pixel_array, px)
    np.testing.assert_allclose(ds.hu(), px.astype(np.float32) - 1024.0)


def test_dicom_stop_before_pixels(tmp_path):
    px = np.zeros((8, 8), np.int16)
    p = tmp_path / "s.dcm"
    write_dicom(p, px)
    ds = read_dicom(p, stop_before_pixels=True)
    assert ds.pixel_array is None and ds.pixel_spacing == pytest.approx((0.7, 0.7))
    with pytest.raises(ValueError):
        ds.hu()


def test_dicom_rejects_compressed_syntax(tmp_path):
    """A file advertising a JPEG transfer syntax must be rejected loudly,
    naming the syntax and its family plus a conversion hint."""
    from dinox_tpu.data.dicom import UnsupportedTransferSyntaxError

    px = np.zeros((4, 4), np.int16)
    p = tmp_path / "s.dcm"
    write_dicom(p, px)
    raw = bytearray(p.read_bytes())
    # same-length UID swap keeps the meta-group length valid
    raw = raw.replace(b"1.2.840.10008.1.2.1\x00", b"1.2.840.10008.1.2.5\x00")
    p.write_bytes(bytes(raw))
    with pytest.raises(UnsupportedTransferSyntaxError,
                       match=r"1\.2\.840\.10008\.1\.2\.5 \(RLE Lossless\)"):
        read_dicom(p)


# -- preprocessing CLI smoke -------------------------------------------------


def test_preprocess_dicom_cli(tmp_path):
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    # build a 2-series DICOM tree
    src = tmp_path / "raw"
    for s in range(2):
        d = src / f"series{s}"
        d.mkdir(parents=True)
        for z in range(3):
            write_dicom(
                d / f"{z}.dcm",
                np.full((16, 16), 100 * z, np.int16),
                series_uid=f"1.2.{s}", position_z=float(z) * 2.0,
                slice_thickness=99.0,  # wrong on purpose; median delta should win
            )
    out = tmp_path / "proc"
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts/preprocessing/preprocess_dicom.py"),
         "--src", str(src), "--out", str(out), "--dataset", "testds"],
        capture_output=True, text=True, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr
    from dinox_tpu.data.index import load_index_rows

    rows = load_index_rows(out / "_index" / "index.csv")
    assert len(rows) == 6
    assert {r.series_dir for r in rows} == {"testds/1_2_0", "testds/1_2_1"}
    assert rows[0].spacing_z == 2.0  # median z-delta, not the bogus tag
    from PIL import Image

    arr = np.asarray(Image.open(rows[0].png_path))
    assert arr.dtype == np.uint16 and arr.shape == (16, 16)


def test_preprocess_nifti_cli(tmp_path):
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    src = tmp_path / "vols"
    src.mkdir()
    write_nifti(src / "colon_001.nii.gz",
                np.random.default_rng(0).normal(0, 200, (12, 12, 4)).astype(np.float32),
                spacing=(0.9, 0.9, 5.0))
    out = tmp_path / "proc"
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts/preprocessing/preprocess_nifti.py"),
         "--src", str(src), "--out", str(out), "--dataset", "msd-test"],
        capture_output=True, text=True, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr
    from dinox_tpu.data.index import load_index_rows

    rows = load_index_rows(out / "_index" / "index.csv")
    assert len(rows) == 4 and rows[0].spacing_z == 5.0
