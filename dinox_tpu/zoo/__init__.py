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


_LAZY = {
    "load_model": "dinox_tpu.zoo.hub",
    "export_hub_checkpoint": "dinox_tpu.zoo.hub",
    "encode": "dinox_tpu.zoo.encode",
    "encode_batch": "dinox_tpu.zoo.encode",
    "apply_lora": "dinox_tpu.zoo.peft",
    "save_adapter": "dinox_tpu.zoo.peft",
    "load_adapter": "dinox_tpu.zoo.peft",
    "merge_adapter": "dinox_tpu.zoo.peft",
    "count_parameters": "dinox_tpu.zoo.peft",
    "generate_model_card": "dinox_tpu.zoo.card",
    "publish_to_hub": "dinox_tpu.zoo.publish",
}


def __getattr__(name):  # lazy re-exports
    # importlib (not `from ... import`): "encode" names both a submodule and
    # a function, and a fromlist import would re-enter this __getattr__.
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


# "encode" names BOTH the implementation submodule and the public function.
# Importing the submodule anywhere (`import dinox_tpu.zoo.encode`) binds the
# module object onto this package, shadowing the lazy function re-export —
# `zoo.encode(...)` would then raise "module is not callable" depending on
# import order. Redirect package-attribute access back to the function
# (the reference binds the function eagerly, zoo/__init__.py; we keep the
# import lazy for provenance-only users).
#
# Known constraint: since Python 3.7, `import dinox_tpu.zoo.encode as m`
# resolves the binding through this parent-package getattr too, so `m` is the
# FUNCTION, not the module. Code that needs the module's internals must use
# `from dinox_tpu.zoo.encode import <name>` (as scripts/serve.py does) or
# importlib.import_module("dinox_tpu.zoo.encode").
import sys as _sys
import types as _types


class _ZooModule(_types.ModuleType):
    def __getattribute__(self, name):
        val = _types.ModuleType.__getattribute__(self, name)
        if isinstance(val, _types.ModuleType) and name in _LAZY:
            return getattr(val, name)
        return val


_sys.modules[__name__].__class__ = _ZooModule
