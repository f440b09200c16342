from fastervit_tpu.models.config import VARIANTS, DataConfig, FasterViTConfig
from fastervit_tpu.models.fastervit import FasterViT, FasterViTLayer, FasterViTPyramid
from fastervit_tpu.models.registry import Model, create_model, get_config, is_model, list_models
