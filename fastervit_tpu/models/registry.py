"""Model registry and factory (reference fastervit/models/registry.py:30-205).

`create_model(name, **kwargs)` returns a `Model` handle bundling the flax
module with its config, plus init/apply/load helpers — the JAX analog of the
reference's `create_model` returning an nn.Module.
"""
from __future__ import annotations

import dataclasses
import fnmatch
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from fastervit_tpu.models.config import VARIANTS, DataConfig, FasterViTConfig
from fastervit_tpu.models.fastervit import FasterViT, FasterViTPyramid


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s.lower())]


def list_models(filter: str = "", pretrained: bool = False) -> list:
    names = list(VARIANTS)
    if filter:
        filters = filter if isinstance(filter, (tuple, list)) else [filter]
        selected = set()
        for f in filters:
            selected.update(fnmatch.filter(names, f))
        names = list(selected)
    return sorted(names, key=_natural_key)


def is_model(name: str) -> bool:
    return name in VARIANTS


def get_config(name: str, **overrides) -> FasterViTConfig:
    cfg = VARIANTS[name]
    if not overrides:
        return cfg
    data_keys = {f.name for f in dataclasses.fields(DataConfig)}
    cfg_keys = {f.name for f in dataclasses.fields(FasterViTConfig)}
    cfg_over: Dict[str, Any] = {}
    data_over: Dict[str, Any] = {}
    for k, v in overrides.items():
        if k == "resolution":
            v = (v, v) if isinstance(v, int) else tuple(v)
            data_over.setdefault("input_size", v)
        if k in cfg_keys:
            cfg_over[k] = tuple(v) if isinstance(v, list) else v
        elif k in data_keys:
            data_over[k] = tuple(v) if isinstance(v, list) else v
        else:
            raise ValueError(f"unknown config override {k!r} for model {name!r}")
    data = dataclasses.replace(cfg.data, **data_over) if data_over else cfg.data
    return dataclasses.replace(cfg, data=data, **cfg_over)


@dataclasses.dataclass
class Model:
    """A (module, config) bundle with functional init/apply helpers."""
    module: FasterViT
    cfg: FasterViTConfig

    def dummy_input(self, batch_size: int = 1, dtype=jnp.float32) -> jnp.ndarray:
        h, w = self.cfg.resolution
        return jnp.zeros((batch_size, h, w, self.cfg.in_chans), dtype)

    def init(self, rng: Optional[jax.Array] = None, batch_size: int = 1):
        """Initialize variables: {'params': ..., 'batch_stats': ...}.

        Jitted: eager init dispatches thousands of tiny ops, which is
        pathologically slow through a remote-TPU relay."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return jax.jit(self.module.init)(rng, self.dummy_input(batch_size))

    def apply(self, variables, x, training: bool = False, rngs=None, **kwargs):
        if training:
            return self.module.apply(variables, x, training=True, rngs=rngs,
                                     mutable=["batch_stats"], **kwargs)
        if getattr(self.module, "quantized", False):
            from fastervit_tpu.ops.quant import quantized_call
            return quantized_call(self.module.apply, variables, x, **kwargs)
        return self.module.apply(variables, x, **kwargs)

    def quantize_variables(self, variables):
        """Offline int8 weight quantization for the serving path (pair with
        create_model(..., quantized=True)); see ops/quant.py."""
        from fastervit_tpu.ops.quant import quantize_variables
        return quantize_variables(variables)

    def load_pytorch(self, checkpoint_path: str):
        """Convert a reference PyTorch checkpoint into this model's variables."""
        from fastervit_tpu.utils.convert import load_pytorch_checkpoint
        return load_pytorch_checkpoint(self, checkpoint_path)

    def bake_posemb(self, variables, dtype=jnp.float32):
        """Deploy mode without AOT (the reference's switch_to_deploy,
        faster_vit.py:263-264,321-330): precompute every position-embedding
        tensor (PosEmbMLPSwinv1D additive embeddings and PosEmbMLPSwinv2D
        dense attention biases — both pure functions of params) into a
        'baked' variables collection. Serving forwards then read the stored
        tensors instead of re-running the table MLP + (H, S, S) expansion
        every block (~1.6 ms/block at the 21k-768 level_2 geometry).

        The baked tensors are resolution-specific; reuse at another
        resolution fails loudly on shape mismatch. HBM cost is the dense
        biases themselves (2 GB bf16 for faster_vit_4_21k_768's twelve
        S=2304 level_2 blocks; negligible for the 224px family).
        """
        h, w = self.cfg.resolution
        # re-bake from scratch: a stale 'baked' collection in the input would
        # make the modules early-return the old tensors (ADVICE r4)
        variables = {k: v for k, v in variables.items() if k != "baked"}
        x = jnp.zeros((1, h, w, self.cfg.in_chans), dtype)
        fn = jax.jit(lambda v, xx: self.module.apply(v, xx,
                                                     mutable=["baked"])[1])
        baked = fn(variables, x)["baked"]
        out = dict(variables)
        out["baked"] = baked
        return out

    def aot_compile(self, variables, batch_size: int, dtype=jnp.float32):
        """Deploy mode (the reference's switch_to_deploy analog,
        faster_vit.py:263-264): AOT-compile the forward with variables
        closed over as constants — position-bias MLPs fold away entirely.
        Returns a ready-to-call compiled executable."""
        import functools
        fn = jax.jit(functools.partial(self.module.apply, variables))
        h, w = self.cfg.resolution
        spec = jax.ShapeDtypeStruct((batch_size, h, w, self.cfg.in_chans),
                                    dtype)
        return fn.lower(spec).compile()


def create_model(name: str, pretrained: bool = False, checkpoint_path: str = "",
                 dtype=jnp.float32, attn_impl: str = "auto",
                 pyramid: bool = False, quantized: bool = False,
                 **kwargs) -> Model:
    """Build a FasterViT model by name (reference registry.py:195-205).

    `pretrained=True` requires a locally available reference checkpoint at
    `checkpoint_path` (this environment has no network egress); it is converted
    on the fly via Model.load_pytorch.
    """
    if not is_model(name):
        raise KeyError(f"unknown model {name!r}; see list_models()")
    cfg = get_config(name, **kwargs)
    cls = FasterViTPyramid if pyramid else FasterViT
    extra = {}
    if quantized:
        if pyramid:
            raise ValueError("int8 serving covers the classifier path; "
                             "pyramid backbones run bf16")
        extra["quantized"] = True
    model = Model(module=cls(cfg=cfg, dtype=dtype, attn_impl=attn_impl,
                             **extra), cfg=cfg)
    if pretrained and not checkpoint_path:
        raise ValueError("pretrained=True needs checkpoint_path (no network egress); "
                         "download the reference .pth.tar manually")
    if checkpoint_path:
        variables = model.load_pytorch(checkpoint_path)
        return model, variables
    return model
