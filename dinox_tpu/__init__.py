"""dinox_tpu — a TPU-native (JAX / XLA / Pallas / pjit) medical-imaging model zoo.

A from-scratch rebuild of the capabilities of timlawrenz/DINO-X (reference at
/root/reference): scale-aware Vision Transformers pretrained on CT slices with
DINOv3-style student-teacher distillation, Gram anchoring and KoLeo
regularization, distributed as backbones + ~5 MB LoRA adapters.

Layout:
    dinox_tpu.models      ViT architecture (flax), model presets
    dinox_tpu.ops         Pallas TPU kernels (flash attention, fused augmentation)
    dinox_tpu.parallel    Mesh / sharding / multi-host utilities
    dinox_tpu.data        Index/manifest readers, host loader, device augmentation
    dinox_tpu.train       Jitted train step, losses, schedules, checkpointing
    dinox_tpu.zoo         Public API: hub, encode, peft(LoRA), registry, manifest,
                          merge, lineage, card, publish
    dinox_tpu.evaluation  Pan-organ 6-metric protocol, view retrieval
"""

__version__ = "0.1.0"
