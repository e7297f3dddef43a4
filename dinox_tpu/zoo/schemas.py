"""Pydantic schemas for the provenance layer.

Field-compatible with the reference's catalog/lineage records (reference:
zoo/models.py) so that YAML catalog entries, Parquet manifests and
``lineage.json`` files written by either implementation interoperate.
"""

from __future__ import annotations

from datetime import UTC, datetime
from typing import Literal, Optional

from pydantic import BaseModel, Field

Modality = Literal["ct", "mri", "xray"]


class PreprocessingConfig(BaseModel):
    """Raw-data -> training-format conversion parameters.

    The 16-bit PNG encoding stores ``uint16 = round(HU) + hu_shift`` and every
    reader decodes ``HU_deci = (uint16 - hu_shift) / scale * ...`` — i.e. the
    training stack operates in deci-HU (reference: zoo/models.py:20-27 and the
    encoding quirk documented in SURVEY.md §2.4).
    """

    format: Literal["png_16bit", "png_8bit", "npy", "nifti"] = "png_16bit"
    hu_shift: int = 32768
    scale: int = 10
    index_csv: str = ""


class DatasetEntry(BaseModel):
    """One catalogued dataset; serialized as a YAML file under
    ``zoo/datasets/<modality>/`` (reference: zoo/models.py:29-48)."""

    name: str
    modality: Modality
    organs: list[str]
    source_url: str = ""
    license: str = ""
    total_slices: int = 0
    total_series: int = 0
    pixel_spacing_range: tuple[float, float] = (0.0, 0.0)
    slice_thickness_range: tuple[float, float] = (0.0, 0.0)
    hu_range: tuple[int, int] = (-1024, 3071)
    annotations: list[str] = Field(default_factory=list)
    preprocessing: PreprocessingConfig = Field(default_factory=PreprocessingConfig)
    citation: str = ""
    notes: str = ""


class SliceMetadata(BaseModel):
    """Per-slice physical metadata; rows of the Parquet manifest. The three
    spacing fields feed the ScaleEmbedding (reference: zoo/models.py:56-71)."""

    dataset: str
    series_id: str
    slice_idx: int
    pixel_spacing_x: float
    pixel_spacing_y: float
    slice_thickness: float
    image_path: str
    organs_present: list[str] = Field(default_factory=list)
    patient_id: Optional[str] = None
    study_date: Optional[str] = None


class DatasetUsage(BaseModel):
    """How one dataset contributed to a training run (zoo/models.py:80-89)."""

    name: str
    slices_used: int
    weight: float
    pixel_spacing_min: float = 0.0
    pixel_spacing_max: float = 0.0
    slice_thickness_min: float = 0.0
    slice_thickness_max: float = 0.0


class SpacingStats(BaseModel):
    """Corpus-level spacing aggregates (zoo/models.py:97-108)."""

    pixel_spacing_x_min: float = 0.0
    pixel_spacing_x_max: float = 0.0
    pixel_spacing_x_mean: float = 0.0
    pixel_spacing_y_min: float = 0.0
    pixel_spacing_y_max: float = 0.0
    pixel_spacing_y_mean: float = 0.0
    slice_thickness_min: float = 0.0
    slice_thickness_max: float = 0.0
    slice_thickness_mean: float = 0.0


class TrainingLineage(BaseModel):
    """Full provenance for a training run; saved as ``lineage.json``
    (reference: zoo/models.py:116-141)."""

    model_name: str
    architecture: str = "vit-small"
    modality: Modality = "ct"
    datasets: list[DatasetUsage] = Field(default_factory=list)
    total_slices: int = 0
    spacing_stats: SpacingStats = Field(default_factory=SpacingStats)
    scale_aware: bool = False
    training_config: dict = Field(default_factory=dict)
    random_seed: int = 42
    timestamp: str = Field(default_factory=lambda: datetime.now(UTC).isoformat())
    tool_version: str = ""
    training_code_commit: str = ""
    data_catalog_hash: str = ""

    def total_weight(self) -> float:
        return sum(d.weight for d in self.datasets)
