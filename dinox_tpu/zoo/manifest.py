"""Parquet-backed per-slice metadata manifest.

Capability parity with reference zoo/manifest.py (save/load Parquet, filter,
uniform & spacing-stratified sampling, aggregate stats), implemented with an
explicit pyarrow schema (one code path for empty and non-empty manifests) and
numpy-based stratification.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dinox_tpu.zoo.schemas import SliceMetadata, SpacingStats

log = logging.getLogger(__name__)

_SCHEMA = pa.schema(
    [
        ("dataset", pa.string()),
        ("series_id", pa.string()),
        ("slice_idx", pa.int64()),
        ("pixel_spacing_x", pa.float64()),
        ("pixel_spacing_y", pa.float64()),
        ("slice_thickness", pa.float64()),
        ("image_path", pa.string()),
        ("organs_present", pa.list_(pa.string())),
        ("patient_id", pa.string()),
        ("study_date", pa.string()),
    ]
)


class DataManifest:
    """Ordered collection of :class:`SliceMetadata` with Parquet I/O."""

    def __init__(self, records: list[SliceMetadata] | None = None) -> None:
        self._records: list[SliceMetadata] = list(records) if records else []

    # -- I/O ------------------------------------------------------------

    def save(self, path: str | Path) -> None:
        """Serialize to Parquet; the explicit schema makes the empty manifest
        round-trip cleanly (reference handles this specially,
        zoo/manifest.py:48-59)."""
        cols: dict[str, list] = {name: [] for name in _SCHEMA.names}
        for r in self._records:
            d = r.model_dump()
            for name in _SCHEMA.names:
                cols[name].append(d[name])
        table = pa.table(cols, schema=_SCHEMA)
        out = Path(path)
        out.parent.mkdir(parents=True, exist_ok=True)
        pq.write_table(table, out)
        log.info("wrote %d manifest records -> %s", len(self._records), out)

    @classmethod
    def load(cls, path: str | Path) -> "DataManifest":
        table = pq.read_table(Path(path))
        return cls([SliceMetadata.model_validate(row) for row in table.to_pylist()])

    # -- accessors ------------------------------------------------------

    @property
    def records(self) -> list[SliceMetadata]:
        return self._records

    def __len__(self) -> int:
        return len(self._records)

    def add(self, record: SliceMetadata) -> None:
        self._records.append(record)

    def extend(self, records: list[SliceMetadata]) -> None:
        self._records.extend(records)

    def datasets(self) -> list[str]:
        return sorted({r.dataset for r in self._records})

    # -- filtering & sampling ------------------------------------------

    def filter(
        self, *, dataset: str | None = None, organs: list[str] | None = None
    ) -> "DataManifest":
        out = self._records
        if dataset is not None:
            out = [r for r in out if r.dataset == dataset]
        if organs is not None:
            want = set(organs)
            out = [r for r in out if want & set(r.organs_present)]
        return DataManifest(out)

    def sample(self, n: int, *, seed: int = 42, strategy: str = "uniform") -> "DataManifest":
        """Draw *n* records without replacement.

        ``strategy="spacing-stratified"`` stratifies over 10 equal-width
        pixel_spacing_x bins (reference: zoo/manifest.py:183-220); a top-up
        pass fills any shortfall uniformly from the unselected remainder.
        """
        if strategy not in ("uniform", "spacing-stratified"):
            raise ValueError(f"Unknown sampling strategy: {strategy}")
        n = min(n, len(self._records))
        rng = np.random.default_rng(seed)
        if strategy == "uniform" or not self._records:
            idx = rng.choice(len(self._records), size=n, replace=False)
            return DataManifest([self._records[i] for i in idx])

        sx = np.asarray([r.pixel_spacing_x for r in self._records])
        lo, hi = float(sx.min()), float(sx.max())
        if lo == hi:
            idx = rng.choice(len(self._records), size=n, replace=False)
            return DataManifest([self._records[i] for i in idx])

        n_bins = 10
        bin_of = np.minimum(((sx - lo) / (hi - lo) * n_bins).astype(int), n_bins - 1)
        chosen: list[int] = []
        occupied = [b for b in range(n_bins) if (bin_of == b).any()]
        per_bin = max(1, n // len(occupied))
        for b in occupied:
            members = np.flatnonzero(bin_of == b)
            take = min(per_bin, members.size)
            chosen.extend(rng.choice(members, size=take, replace=False).tolist())
        if len(chosen) < n:
            rest = np.setdiff1d(np.arange(len(self._records)), np.asarray(chosen))
            extra = rng.choice(rest, size=min(n - len(chosen), rest.size), replace=False)
            chosen.extend(extra.tolist())
        return DataManifest([self._records[i] for i in chosen[:n]])

    # -- statistics -----------------------------------------------------

    def spacing_stats(self) -> SpacingStats:
        if not self._records:
            return SpacingStats()
        sx = np.asarray([r.pixel_spacing_x for r in self._records])
        sy = np.asarray([r.pixel_spacing_y for r in self._records])
        st = np.asarray([r.slice_thickness for r in self._records])
        return SpacingStats(
            pixel_spacing_x_min=float(sx.min()),
            pixel_spacing_x_max=float(sx.max()),
            pixel_spacing_x_mean=float(sx.mean()),
            pixel_spacing_y_min=float(sy.min()),
            pixel_spacing_y_max=float(sy.max()),
            pixel_spacing_y_mean=float(sy.mean()),
            slice_thickness_min=float(st.min()),
            slice_thickness_max=float(st.max()),
            slice_thickness_mean=float(st.mean()),
        )
