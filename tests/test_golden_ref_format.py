"""Golden-file compatibility tests against artifacts produced by the
REFERENCE's own preprocessing writer (its --dry-run synthetic mode):
tests/fixtures/golden_ref/ holds two 16-bit HU PNGs + index.csv emitted by
reference scripts/preprocessing/phase2_preprocess_lidc_idri.py, plus .npy
dumps of their decoded pixel values. Every reader in this stack must decode
them identically, and our writer's output must survive the same round trip —
the de-risking the round-1 review asked for (data compatibility proven
against reference-produced bytes, not just against our own formulas)."""

import csv
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

FIX = Path(__file__).parent / "fixtures" / "golden_ref"


@pytest.mark.parametrize("name", ["slice_0000", "slice_0007"])
def test_pil_reader_decodes_reference_png(name):
    arr = np.asarray(Image.open(FIX / f"{name}.png"), dtype=np.uint16)
    want = np.load(FIX / f"{name}.npy")
    np.testing.assert_array_equal(arr, want)


@pytest.mark.parametrize("name", ["slice_0000", "slice_0007"])
def test_native_decoder_matches_golden(name):
    from dinox_tpu.data import png_native

    data = (FIX / f"{name}.png").read_bytes()
    arr = png_native.decode_png16(data)
    if arr is None:
        pytest.skip("native decoder unavailable or unsupported PNG variant")
    np.testing.assert_array_equal(arr, np.load(FIX / f"{name}.npy"))


@pytest.mark.parametrize("name", ["slice_0000", "slice_0007"])
def test_pipeline_reader_matches_golden(name):
    from dinox_tpu.data.pipeline import _read_png_u16

    arr = _read_png_u16(str(FIX / f"{name}.png"))
    np.testing.assert_array_equal(arr, np.load(FIX / f"{name}.npy"))


def test_hu_decode_of_reference_pixels():
    """deci-HU decode of reference-encoded pixels stays in the documented
    clip range (uint16 = HU + 32768, HU in [-1000, 4000]; SURVEY.md §2.4)."""
    from dinox_tpu.data.hu import decode_hu16

    arr = np.load(FIX / "slice_0000.npy")
    hu10 = decode_hu16(arr)
    assert hu10.min() >= -1000 * 0.1 - 1e-6
    assert hu10.max() <= 4000 * 0.1 + 1e-6


def test_our_encoder_round_trips_through_reference_decode():
    """Values written with our encoder decode with the reference's formula
    ((uint16 - 32768) * 0.1) back to the original HU, including through an
    actual PNG byte stream."""
    import io

    from dinox_tpu.data.hu import encode_hu16

    rng = np.random.default_rng(0)
    hu = rng.integers(-1000, 4000, (64, 64)).astype(np.float32)
    u16 = encode_hu16(hu)
    buf = io.BytesIO()
    Image.fromarray(u16.astype(np.int32), mode="I").convert("I;16").save(buf, "PNG")
    back = np.asarray(Image.open(io.BytesIO(buf.getvalue())), dtype=np.uint16)
    hu10_back = (back.astype(np.float32) - 32768.0) * 0.1  # reference decode
    np.testing.assert_allclose(hu10_back, np.round(hu) * 0.1, atol=1e-4)


def test_reference_index_csv_parses():
    """The reference index format (encoding tag, spacing columns) loads
    through our index reader unchanged."""
    from dinox_tpu.data.index import load_index_rows

    with open(FIX / "index.csv") as f:
        raw = list(csv.DictReader(f))
    assert raw[0]["encoding"].startswith("hu16_i16_offset32768")
    rows = load_index_rows(FIX / "index.csv", require_spacing=True)
    assert len(rows) == 2
    assert rows[0].spacing_x == pytest.approx(0.75)
    assert rows[0].spacing_z == pytest.approx(1.5)
