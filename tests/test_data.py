"""Data pipeline tests: HU codec golden values, index/sampler logic, host
loader robustness, and device-side augmentation (analog of reference
tests/test_data_loader.py; SURVEY.md §4)."""

import numpy as np
import pytest
from PIL import Image

from dinox_tpu.data import hu
from dinox_tpu.data.index import (
    IndexRow,
    SeriesMap,
    exclude_val_series,
    load_index_rows,
    make_split_manifest,
    shard_rows,
    write_index_rows,
    z_stride_subsample,
)
from dinox_tpu.data.pipeline import Batch, SliceStackSource, TrainLoader
from dinox_tpu.data.sampler import batched, diverse_order, shuffled_order


def make_hu16_png(path, value_hu=0.0, size=32, seed=None):
    """Write a 16-bit PNG in the reference encoding uint16 = HU + 32768."""
    if seed is not None:
        arr = np.random.default_rng(seed).integers(30000, 36000, (size, size))
    else:
        arr = np.full((size, size), value_hu + 32768)
    img = Image.fromarray(arr.astype(np.uint16))
    path.parent.mkdir(parents=True, exist_ok=True)
    img.save(path)
    return arr.astype(np.uint16)


@pytest.fixture
def index_tree(tmp_path):
    """Two datasets x two series x five slices of tiny PNGs + index rows."""
    rows = []
    for ds in ("dsa", "dsb"):
        for s in range(2):
            for z in range(5):
                p = tmp_path / ds / f"series{s}" / f"{z:03d}.png"
                make_hu16_png(p, seed=hash((ds, s, z)) % 2**31)
                rows.append(
                    IndexRow(
                        png_path=str(p),
                        series_dir=f"{ds}/series{s}",
                        slice_index=z,
                        encoding="hu16",
                        spacing_x=0.7 + s * 0.1,
                        spacing_y=0.7 + s * 0.1,
                        spacing_z=1.5,
                        dataset=ds,
                    )
                )
    return rows


# -- HU codec golden values -------------------------------------------------


def test_hu16_roundtrip_golden():
    hu_true = np.asarray([-1000.0, 0.0, 40.0, 3000.0])
    enc = hu.encode_hu16(hu_true)
    np.testing.assert_array_equal(enc, [31768, 32768, 32808, 35768])
    # Decode is in deci-HU: (u16 - 32768) * 0.1
    dec = hu.decode_hu16(enc)
    np.testing.assert_allclose(dec, hu_true * 0.1, atol=1e-5)


def test_window_formula_golden():
    # level=40, width=400 (deci-HU): lo=-160, hi=240
    x = np.asarray([-160.0, 40.0, 240.0, -1000.0, 1000.0])
    w = hu.window(x, 40.0, 400.0)
    np.testing.assert_allclose(w, [0.0, 0.5, 1.0, 0.0, 1.0], atol=1e-6)
    # Degenerate width guards against division blow-up
    assert np.isfinite(hu.window(x, 0.0, 0.5)).all()


# -- index ------------------------------------------------------------------


def test_index_csv_roundtrip(tmp_path, index_tree):
    csv_path = tmp_path / "index.csv"
    write_index_rows(index_tree, csv_path)
    back = load_index_rows(csv_path)
    assert len(back) == len(index_tree)
    assert back[0] == index_tree[0]


def test_index_missing_spacing_warns(tmp_path):
    p = tmp_path / "nospace.csv"
    p.write_text("png_path,series_dir,slice_index,encoding\na.png,s,0,hu16\n")
    with pytest.warns(UserWarning, match="spacing"):
        rows = load_index_rows(p, require_spacing=True)
    assert rows[0].spacing_x == 1.0


def test_split_manifest_excludes_series(index_tree):
    man = make_split_manifest(index_tree, val_fraction=0.25, seed=0)
    assert len(man["val"]["series_dir"]) == 1
    kept = exclude_val_series(index_tree, man)
    assert len(kept) == 15
    assert not {r.series_dir for r in kept} & set(man["val"]["series_dir"])
    # determinism
    assert make_split_manifest(index_tree, val_fraction=0.25, seed=0) == man


def test_z_stride(index_tree):
    out = z_stride_subsample(index_tree, 2)
    assert len(out) == 12  # ceil(5/2)=3 per series x 4 series
    one = [r for r in out if r.series_dir == "dsa/series0"]
    assert [r.slice_index for r in one] == [0, 2, 4]


def test_shard_rows_disjoint_and_complete(index_tree):
    shards = [shard_rows(index_tree, h, 4) for h in range(4)]
    all_paths = sorted(p.png_path for s in shards for p in s)
    assert all_paths == sorted(r.png_path for r in index_tree)


def test_series_neighbors_clamped(index_tree):
    sm = SeriesMap.build(index_tree)
    first = index_tree[0]  # slice 0
    a, b, c = sm.neighbors(first)
    assert (a.slice_index, b.slice_index, c.slice_index) == (0, 0, 1)
    last = index_tree[4]  # slice 4
    a, b, c = sm.neighbors(last)
    assert (a.slice_index, b.slice_index, c.slice_index) == (3, 4, 4)


# -- sampler ----------------------------------------------------------------


def test_shuffled_order_deterministic():
    a = shuffled_order(100, seed=1, epoch=3)
    b = shuffled_order(100, seed=1, epoch=3)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, shuffled_order(100, seed=1, epoch=4))
    assert sorted(a.tolist()) == list(range(100))


def test_diverse_order_one_per_series_per_batch(index_tree):
    order = diverse_order(index_tree, seed=0, epoch=0)
    assert sorted(order.tolist()) == list(range(len(index_tree)))
    for chunk in batched(order, 4):
        series = [index_tree[i].series_dir for i in chunk]
        assert len(set(series)) == 4  # 4 series available, batch of 4 -> all distinct


# -- host loader ------------------------------------------------------------


def test_slice_stack_source_shapes(index_tree):
    src = SliceStackSource(index_tree, canvas=64)
    pixels, spacing, idx = src.get(7)
    assert pixels.shape == (64, 64, 3) and pixels.dtype == np.uint16
    assert spacing.shape == (3,) and idx == 7


def test_source_retries_on_corrupt_file(index_tree, tmp_path):
    # Corrupt one PNG; loading that index must fall back to a substitute.
    bad = index_tree[3]
    with open(bad.png_path, "wb") as f:
        f.write(b"not a png")
    src = SliceStackSource(index_tree, canvas=32)
    pixels, spacing, idx = src.get(3, np.random.default_rng(0))
    assert idx != 3 and pixels.shape == (32, 32, 3)


def test_train_loader_batches_and_position(index_tree):
    loader = TrainLoader(index_tree, batch_size=4, seed=0, canvas=32, num_workers=2)
    it = iter(loader)
    b1 = next(it)
    assert b1.pixels.shape == (4, 32, 32, 3) and b1.pixels.dtype == np.uint16
    assert b1.spacing.shape == (4, 3)
    assert loader.position == (0, 1)
    for _ in range(4):  # 20 rows / bs4 = 5 batches/epoch
        next(it)
    assert loader.position[0] == 1  # rolled into next epoch
    loader.close()


def test_train_loader_deterministic_across_instances(index_tree):
    def first_batch():
        loader = TrainLoader(index_tree, batch_size=4, seed=123, canvas=32, num_workers=2)
        b = next(iter(loader))
        loader.close()
        return b

    b1, b2 = first_batch(), first_batch()
    np.testing.assert_array_equal(b1.pixels, b2.pixels)
    np.testing.assert_array_equal(b1.indices, b2.indices)


def test_train_loader_close_unblocks_producer(index_tree):
    """close() must terminate the producer thread even when the prefetch
    queue is full and nobody consumes (a plain q.put would block forever)."""
    import threading
    import time as _time

    loader = TrainLoader(index_tree, batch_size=2, seed=0, canvas=32,
                         num_workers=2, prefetch=1)
    it = iter(loader)
    next(it)  # start the producer; queue refills behind the one consumed batch
    _time.sleep(0.3)  # let the producer block on the full queue
    loader.close()
    deadline = _time.monotonic() + 5.0
    while _time.monotonic() < deadline:
        if not any(t.name == "dinox-producer" and t.is_alive()
                   for t in threading.enumerate()):
            break
        _time.sleep(0.1)
    assert not any(t.name == "dinox-producer" and t.is_alive()
                   for t in threading.enumerate()), "producer thread leaked"


def test_train_loader_multihost_keeps_neighbor_context(index_tree):
    """Host sharding splits the epoch ORDER, not the row set: every host must
    still resolve true (z-1, z, z+1) neighbors, and the hosts' batches must
    be disjoint within an epoch."""
    a = TrainLoader(index_tree, batch_size=2, seed=7, canvas=32,
                    num_workers=1, host_id=0, num_hosts=2)
    b = TrainLoader(index_tree, batch_size=2, seed=7, canvas=32,
                    num_workers=1, host_id=1, num_hosts=2)
    # full SeriesMap retained on both hosts
    for ld in (a, b):
        assert sum(len(d) for d in ld.source.series.by_series.values()) == len(index_tree)
    batch_a = next(iter(a))
    batch_b = next(iter(b))
    a.close(); b.close()
    # the hosts' epoch shards must not overlap: same seed, different host_id
    # -> disjoint row indices
    assert set(batch_a.indices.tolist()) & set(batch_b.indices.tolist()) == set()
    # interior slices must have distinct z-1/z/z+1 planes (not center copies)
    for batch in (batch_a, batch_b):
        distinct = [
            not (np.array_equal(px[..., 0], px[..., 1]) and
                 np.array_equal(px[..., 1], px[..., 2]))
            for px in batch.pixels
        ]
        assert any(distinct), "2.5D stacks degenerated to center copies"


def test_device_prefetcher_places_and_propagates():
    """DevicePrefetcher yields device-resident batches in order, lifts
    (B, ...) to (1, B, ...), finishes cleanly on source exhaustion, and
    repropagates producer exceptions."""
    from dinox_tpu.data.prefetch import DevicePrefetcher

    def src(n, fail_at=None):
        rng = np.random.default_rng(0)
        for i in range(n):
            if fail_at is not None and i == fail_at:
                raise RuntimeError("boom")
            yield Batch(
                pixels=rng.integers(30000, 36000, (4, 32, 32, 3), dtype=np.uint16),
                spacing=np.full((4, 3), float(i), np.float32),
                indices=np.arange(4),
            )

    got = list(DevicePrefetcher(src(3), depth=2))
    assert len(got) == 3
    for i, b in enumerate(got):
        assert hasattr(b.pixels, "addressable_shards")  # device-resident
        assert b.pixels.shape == (1, 4, 32, 32, 3)
        assert float(np.asarray(b.spacing)[0, 0, 0]) == float(i)  # order kept

    with pytest.raises(RuntimeError, match="boom"):
        list(DevicePrefetcher(src(5, fail_at=1), depth=2))
