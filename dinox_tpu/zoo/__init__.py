"""Public zoo API (parity with reference zoo/__init__.py).

Heavy modules (hub/encode/peft depend on JAX; publish on huggingface_hub) are
imported lazily so provenance-only users don't pay for them.
"""

from dinox_tpu.zoo.lineage import (
    compute_catalog_hash,
    get_git_commit,
    load_lineage,
    record_lineage,
)
from dinox_tpu.zoo.manifest import DataManifest
from dinox_tpu.zoo.merge import DatasetMerger, temperature_weights
from dinox_tpu.zoo.registry import DatasetRegistry
from dinox_tpu.zoo.schemas import (
    DatasetEntry,
    DatasetUsage,
    PreprocessingConfig,
    SliceMetadata,
    SpacingStats,
    TrainingLineage,
)

__all__ = [
    "DataManifest",
    "DatasetEntry",
    "DatasetMerger",
    "DatasetRegistry",
    "DatasetUsage",
    "PreprocessingConfig",
    "SliceMetadata",
    "SpacingStats",
    "TrainingLineage",
    "compute_catalog_hash",
    "get_git_commit",
    "load_lineage",
    "record_lineage",
    "temperature_weights",
    # lazy: "load_model", "encode", "encode_batch", "apply_lora",
    # "save_adapter", "load_adapter", "generate_model_card", "publish_to_hub"
]


def __getattr__(name):  # lazy re-exports
    if name in ("load_model", "export_hub_checkpoint"):
        from dinox_tpu.zoo import hub

        return getattr(hub, name)
    if name in ("encode", "encode_batch"):
        from dinox_tpu.zoo import encode as _encode

        return getattr(_encode, name)
    if name in ("apply_lora", "save_adapter", "load_adapter", "count_parameters"):
        from dinox_tpu.zoo import peft as _peft

        return getattr(_peft, name)
    if name == "generate_model_card":
        from dinox_tpu.zoo.card import generate_model_card

        return generate_model_card
    if name == "publish_to_hub":
        from dinox_tpu.zoo.publish import publish_to_hub

        return publish_to_hub
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
