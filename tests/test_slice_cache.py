"""Decoded-slice memmap cache (round-5, VERDICT r4 #5): the write-once
uint16 cache must be bit-identical to the PNG decode path, shared by row
subsets (train/val of one index), and fail safe (missing/corrupt/mismatched
cache -> silent PNG fallback)."""

import json
from pathlib import Path

import numpy as np
import pytest

from dinox_tpu.data.index import IndexRow
from dinox_tpu.data.pipeline import SliceStackSource, TrainLoader
from dinox_tpu.data.slice_cache import (
    _fingerprint,
    build_slice_cache,
    cache_paths,
    open_slice_cache,
)
from tests.test_data import make_hu16_png

CANVAS = 32


@pytest.fixture
def tree(tmp_path):
    rows = []
    for s in range(2):
        for z in range(4):
            p = tmp_path / "ds" / f"series{s}" / f"{z:03d}.png"
            make_hu16_png(p, seed=(s * 10 + z) or 1, size=CANVAS)
            rows.append(IndexRow(
                png_path=str(p), series_dir=f"ds/series{s}", slice_index=z,
                encoding="hu16", spacing_x=0.7, spacing_y=0.7, spacing_z=1.5,
                dataset="ds"))
    return tmp_path, rows


def test_build_open_and_bit_exact_stacks(tree):
    root, rows = tree
    build_slice_cache(rows, CANVAS, root, workers=2)
    cache = open_slice_cache(root, CANVAS)
    assert cache is not None and len(cache) == len(rows)

    plain = SliceStackSource(rows, CANVAS)
    cached = SliceStackSource(rows, CANVAS, decoded_cache=cache)
    for i in range(len(rows)):
        a, sp_a, _ = plain.get(i)
        b, sp_b, _ = cached.get(i)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(sp_a, sp_b)


def test_loader_stream_identical_with_cache(tree):
    root, rows = tree
    build_slice_cache(rows, CANVAS, root, workers=2)
    cache = open_slice_cache(root, CANVAS)

    def first_batches(decoded_cache, n=3):
        loader = TrainLoader(rows, 4, seed=7, canvas=CANVAS, num_workers=2,
                             decoded_cache=decoded_cache)
        it = iter(loader)
        out = [next(it) for _ in range(n)]
        loader.close()
        return out

    for off, on in zip(first_batches(None), first_batches(cache)):
        np.testing.assert_array_equal(off.pixels, on.pixels)
        np.testing.assert_array_equal(off.spacing, on.spacing)
        np.testing.assert_array_equal(off.indices, on.indices)


def test_subset_rows_share_full_cache(tree):
    root, rows = tree
    build_slice_cache(rows, CANVAS, root, workers=2)
    cache = open_slice_cache(root, CANVAS)
    subset = [r for r in rows if r.series_dir.endswith("series1")]
    src = SliceStackSource(subset, CANVAS, decoded_cache=cache)
    px, _, _ = src.get(0)
    ref, _, _ = SliceStackSource(subset, CANVAS).get(0)
    np.testing.assert_array_equal(px, ref)


def test_fail_safe_fallbacks(tree):
    root, rows = tree
    # missing -> None
    assert open_slice_cache(root, CANVAS) is None
    build_slice_cache(rows, CANVAS, root, workers=2)
    # canvas mismatch -> None
    assert open_slice_cache(root, CANVAS * 2) is None
    # truncated bin -> None (size check)
    bin_path, meta_path = cache_paths(root, CANVAS)
    data = bin_path.read_bytes()
    bin_path.write_bytes(data[:-10])
    assert open_slice_cache(root, CANVAS) is None
    bin_path.write_bytes(data)
    assert open_slice_cache(root, CANVAS) is not None
    # corrupt meta -> None
    meta_path.write_text("{not json")
    assert open_slice_cache(root, CANVAS) is None
    # legacy meta without source fingerprints -> treated stale -> None
    paths = sorted({r.png_path for r in rows})
    meta_path.write_text(json.dumps(
        {"canvas": CANVAS, "n": len(rows),
         "paths": {p: i for i, p in enumerate(paths)}}))
    assert open_slice_cache(root, CANVAS) is None
    # unknown path -> miss (None from get), loader decodes the PNG instead
    meta_path.write_text(json.dumps(
        {"canvas": CANVAS, "n": len(rows),
         "paths": {p: i for i, p in enumerate(paths)},
         "source": _fingerprint(paths)}))
    cache = open_slice_cache(root, CANVAS)
    assert cache.get("/nonexistent.png") is None
    src = SliceStackSource(rows, CANVAS, decoded_cache=cache)
    px, _, _ = src.get(2)
    assert px.shape == (CANVAS, CANVAS, 3)


def test_stale_source_detected(tree):
    """Regenerating a PNG in place must invalidate the cache (open -> None)
    and make a no-force rebuild actually rebuild — never silently serve the
    old pixels."""
    root, rows = tree
    build_slice_cache(rows, CANVAS, root, workers=2)
    assert open_slice_cache(root, CANVAS) is not None
    # regenerate one source PNG with different pixels
    victim = rows[3]
    make_hu16_png(Path(victim.png_path), seed=999, size=CANVAS)
    assert open_slice_cache(root, CANVAS) is None
    # build without force notices staleness and rebuilds to the new pixels
    build_slice_cache(rows, CANVAS, root, workers=2)
    cache = open_slice_cache(root, CANVAS)
    assert cache is not None
    fresh, _, _ = SliceStackSource([victim], CANVAS).get(0)
    cached, _, _ = SliceStackSource([victim], CANVAS, decoded_cache=cache).get(0)
    np.testing.assert_array_equal(fresh, cached)


def test_build_is_idempotent_and_force_rebuilds(tree):
    root, rows = tree
    p1 = build_slice_cache(rows, CANVAS, root, workers=2)
    mtime = p1.stat().st_mtime_ns
    p2 = build_slice_cache(rows, CANVAS, root, workers=2)  # no-op
    assert p2.stat().st_mtime_ns == mtime
    build_slice_cache(rows, CANVAS, root, workers=2, force=True)
    cache = open_slice_cache(root, CANVAS)
    assert cache is not None and len(cache) == len(rows)
