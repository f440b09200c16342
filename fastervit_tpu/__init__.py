"""fastervit_tpu: TPU-native FasterViT framework (JAX / XLA / Pallas).

A from-scratch rebuild of NVlabs/FasterViT for TPU: flax models (NHWC),
fused Pallas attention kernels, pjit data-parallel training/eval, orbax
checkpointing, and PyTorch-checkpoint weight conversion.
"""
__version__ = "0.1.0"

from fastervit_tpu.models.registry import (Model, create_model, get_config,
                                           is_model, list_models)
from fastervit_tpu.models.config import VARIANTS, FasterViTConfig

__all__ = ["create_model", "list_models", "is_model", "get_config", "Model",
           "FasterViTConfig", "VARIANTS", "__version__"]
