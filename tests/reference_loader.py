"""Import the reference PyTorch FasterViT (/root/reference) for parity tests.

The environment has no timm, so we install a minimal stub providing exactly
the six symbols the reference imports (register_model, trunc_normal_,
DropPath, LayerNorm2d, resolve_pretrained_cfg, _update_default_model_kwargs).
Test-only: the reference model is the *oracle*, never a dependency of
fastervit_tpu itself.
"""
import sys
import types

_REFERENCE_ROOT = "/root/reference"


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class DropPath(nn.Module):
        """timm stochastic depth (identity in eval; scale_by_keep=True)."""

        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = float(drop_prob)
            self.scale_by_keep = scale_by_keep

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            if self.scale_by_keep:
                mask.div_(keep)
            return x * mask

    class LayerNorm2d(nn.LayerNorm):
        """timm channel-wise LayerNorm for NCHW (timm/layers/norm.py, eps 1e-6)."""

        def __init__(self, num_channels, eps=1e-6, affine=True):
            super().__init__(num_channels, eps=eps, elementwise_affine=affine)

        def forward(self, x):
            x = x.permute(0, 2, 3, 1)
            x = F.layer_norm(x, self.normalized_shape, self.weight, self.bias, self.eps)
            return x.permute(0, 3, 1, 2)

    def register_model(fn):
        return fn

    class _Cfg:
        def to_dict(self):
            return {}

    def resolve_pretrained_cfg(name):
        return _Cfg()

    def _update_default_model_kwargs(pretrained_cfg, kwargs, kwargs_filter=None):
        return None

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_registry = types.ModuleType("timm.models.registry")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_builder = types.ModuleType("timm.models._builder")
    timm_registry.register_model = register_model
    timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm_layers.DropPath = DropPath
    timm_layers.LayerNorm2d = LayerNorm2d
    timm_builder.resolve_pretrained_cfg = resolve_pretrained_cfg
    timm_builder._update_default_model_kwargs = _update_default_model_kwargs
    timm.models = timm_models
    timm_models.registry = timm_registry
    timm_models.layers = timm_layers
    timm_models._builder = timm_builder
    for name, mod in [("timm", timm), ("timm.models", timm_models),
                      ("timm.models.registry", timm_registry),
                      ("timm.models.layers", timm_layers),
                      ("timm.models._builder", timm_builder)]:
        sys.modules[name] = mod


def load_reference():
    """Return the reference `fastervit` package (torch)."""
    _install_timm_stub()
    if _REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, _REFERENCE_ROOT)
    import fastervit  # noqa: F401
    return fastervit
