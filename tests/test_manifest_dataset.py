"""Manifest -> loader bridge tests (the pan-organ merge feeds training)."""

import numpy as np

from dinox_tpu.data.manifest_dataset import load_manifest_rows, manifest_rows
from dinox_tpu.data.pipeline import TrainLoader
from dinox_tpu.zoo.manifest import DataManifest
from dinox_tpu.zoo.merge import DatasetMerger
from dinox_tpu.zoo.schemas import SliceMetadata
from tests.test_data import make_hu16_png


def build_manifest(tmp_path, datasets=("a", "b"), n_series=2, n_slices=4):
    records = []
    for ds in datasets:
        for s in range(n_series):
            for z in range(n_slices):
                p = tmp_path / ds / f"s{s}" / f"{z}.png"
                make_hu16_png(p, seed=hash((ds, s, z)) % 2**31)
                records.append(
                    SliceMetadata(
                        dataset=ds, series_id=f"s{s}", slice_idx=z,
                        pixel_spacing_x=0.6, pixel_spacing_y=0.6, slice_thickness=1.2,
                        image_path=str(p),
                    )
                )
    return DataManifest(records)


def test_manifest_rows_mapping(tmp_path):
    m = build_manifest(tmp_path)
    rows = manifest_rows(m)
    assert len(rows) == len(m)
    r = rows[0]
    assert r.series_dir == "a:s0" and r.spacing_z == 1.2 and r.dataset == "a"


def test_merged_manifest_trains(tmp_path):
    """Temperature-merged (oversampled) manifest flows into TrainLoader."""
    m = build_manifest(tmp_path)
    merger = DatasetMerger()
    merger.add(m.filter(dataset="a"))
    merger.add(m.filter(dataset="b"))
    merged, _ = merger.build(seed=0, total_slices=24, strategy="temperature")
    rows = manifest_rows(merged)
    assert len(rows) == 24  # includes oversampled repeats
    loader = TrainLoader(rows, batch_size=4, seed=0, canvas=32, num_workers=2)
    batch = next(iter(loader))
    assert batch.pixels.shape == (4, 32, 32, 3)
    loader.close()


def test_parquet_roundtrip_to_rows(tmp_path):
    m = build_manifest(tmp_path)
    pq = tmp_path / "m.parquet"
    m.save(pq)
    rows = load_manifest_rows(pq)
    assert len(rows) == len(m)
    assert all(np.isfinite([r.spacing_x, r.spacing_y, r.spacing_z]).all() for r in rows)
