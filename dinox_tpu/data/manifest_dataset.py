"""Bridge from the provenance layer (DataManifest) to the training loader.

The analog of the reference's manifest-backed datasets (zoo/data.py
ManifestDataset/ManifestEvalDataset): a DataManifest (e.g. the output of a
temperature-weighted DatasetMerger.build) converts to loader rows, so the
pan-organ merge pipeline feeds TrainLoader / the eval embedder directly.
2.5D context, windowing and augmentation come from the shared loader +
device-augmentation path.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

from dinox_tpu.data.index import IndexRow
from dinox_tpu.zoo.manifest import DataManifest
from dinox_tpu.zoo.schemas import SliceMetadata


def record_to_row(rec: SliceMetadata, data_root: Optional[str | Path] = None) -> IndexRow:
    path = Path(rec.image_path)
    if data_root is not None and not path.is_absolute():
        path = Path(data_root) / path
    return IndexRow(
        png_path=str(path),
        series_dir=f"{rec.dataset}:{rec.series_id}",
        slice_index=rec.slice_idx,
        encoding="hu16",
        spacing_x=rec.pixel_spacing_x,
        spacing_y=rec.pixel_spacing_y,
        spacing_z=rec.slice_thickness,
        dataset=rec.dataset,
    )


def manifest_rows(
    manifest: DataManifest, data_root: Optional[str | Path] = None
) -> list[IndexRow]:
    """All manifest records as loader rows (keeps merge-produced order, so an
    oversampled slice appears as many times as the merger emitted it)."""
    return [record_to_row(r, data_root) for r in manifest.records]


def load_manifest_rows(
    parquet_path: str | Path, data_root: Optional[str | Path] = None
) -> list[IndexRow]:
    return manifest_rows(DataManifest.load(parquet_path), data_root)
