from dinox_tpu.models.config import HUB_DEFAULT_CONFIG, MODEL_CONFIGS, ModelConfig
from dinox_tpu.models.moe import MoeMlp
from dinox_tpu.models.vit import (
    Attention,
    DinoHead,
    DinoStudentTeacher,
    Mlp,
    PatchViT,
    ScaleEmbedding,
    TransformerBlock,
    init_backbone,
    init_model,
)

__all__ = [
    "HUB_DEFAULT_CONFIG",
    "MODEL_CONFIGS",
    "ModelConfig",
    "Attention",
    "MoeMlp",
    "DinoHead",
    "DinoStudentTeacher",
    "Mlp",
    "PatchViT",
    "ScaleEmbedding",
    "TransformerBlock",
    "init_backbone",
    "init_model",
]
