"""FasterViT model: 4-stage hierarchical vision backbone (flax.linen, NHWC).

TPU-native rebuild of the reference FasterViT
(/root/reference/fastervit/models/faster_vit.py:741-972) unified with its
any-resolution generalization (faster_vit_any_res.py:753-1002): stage geometry
(padding to window multiples, per-axis sr ratios, rectangular carrier-token
grids) is derived from the trace-time input shape, so the square 224-class
variants and the rectangular any-res variants are one implementation. All pad
amounts are static under jit; XLA sees fixed shapes throughout.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from fastervit_tpu.models.config import FasterViTConfig
from fastervit_tpu.models.layers import (ConvBlock, Downsample, HAT,
                                         PatchEmbed, TokenInitializer,
                                         trunc_normal_init)
from fastervit_tpu.ops.windows import window_partition, window_reverse


class FasterViTLayer(nn.Module):
    """One stage: ConvBlocks (stages 0-1) or HAT blocks (stages 2-3) with
    window partition/reverse and optional carrier-token initializer
    (reference FasterViTLayer, faster_vit.py:741-843; pad/crop semantics from
    faster_vit_any_res.py:824-870)."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    ct_size: int = 1
    conv: bool = False
    downsample: bool = True
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    layer_scale: Optional[float] = None
    layer_scale_conv: Optional[float] = None
    only_local: bool = False
    hierarchy: bool = True
    do_propagation: bool = False
    dynamic_mode: bool = False   # downstream runtime-dynamic variant
    quantized: bool = False      # int8 serving (ops/quant.py)
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, training: bool = False, return_pre_downsample: bool = False):
        deterministic = not training
        b, h, w, c = x.shape

        if self.conv:
            for i in range(self.depth):
                x = ConvBlock(self.dim, drop_path=self.drop_path[i],
                              layer_scale=self.layer_scale_conv, dtype=self.dtype,
                              name=f"blocks_{i}")(x, training=training,
                                                  deterministic=deterministic)
        else:
            ws = self.window_size
            pad_b = (ws - h % ws) % ws
            pad_r = (ws - w % ws) % ws
            hp, wp = h + pad_b, w + pad_r
            if pad_b or pad_r:
                x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            sr = (hp // ws, wp // ws) if not self.only_local else (1, 1)
            do_gt = (not self.only_local) and self.hierarchy and (sr[0] > 1 or sr[1] > 1)

            ct = None
            if do_gt:
                ct = TokenInitializer(self.dim, input_resolution=(hp, wp),
                                      window_size=ws, ct_size=self.ct_size,
                                      raster_output=self.dynamic_mode,
                                      dtype=self.dtype, name="global_tokenizer")(x)
            x = window_partition(x, ws)
            for i in range(self.depth):
                x, ct = HAT(self.dim, num_heads=self.num_heads, sr_ratio=sr,
                            window_size=ws, ct_size=self.ct_size,
                            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                            qk_scale=self.qk_scale, drop=self.drop,
                            attn_drop=self.attn_drop, drop_path=self.drop_path[i],
                            layer_scale=self.layer_scale, last=(i == self.depth - 1),
                            do_propagation=self.do_propagation,
                            dynamic_mode=self.dynamic_mode,
                            quantized=self.quantized, dtype=self.dtype,
                            attn_impl=self.attn_impl,
                            name=f"blocks_{i}")(x, ct, deterministic=deterministic)
            x = window_reverse(x, ws, hp, wp)
            if pad_b or pad_r:
                x = x[:, :h, :w]

        pre = x
        if self.downsample:
            x = Downsample(self.dim, dtype=self.dtype, name="downsample")(x)
        if return_pre_downsample:
            return x, pre
        return x


def _build_levels(cfg: FasterViTConfig, dtype, attn_impl, dynamic_mode=False,
                  quantized=False):
    """Construct the four stage modules; must be called inside an active
    @nn.compact context so the layers bind to the calling module."""
    dpr = cfg.drop_path_schedule()
    levels = []
    for i in range(cfg.num_levels):
        start = sum(cfg.depths[:i])
        levels.append(FasterViTLayer(
            dim=cfg.level_dim(i), depth=cfg.depths[i],
            num_heads=cfg.num_heads[i], window_size=cfg.window_size[i],
            ct_size=cfg.ct_size, conv=(i < 2), downsample=(i < 3),
            mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
            qk_scale=cfg.qk_scale, drop=cfg.drop_rate,
            attn_drop=cfg.attn_drop_rate,
            drop_path=dpr[start:start + cfg.depths[i]],
            layer_scale=cfg.layer_scale, layer_scale_conv=cfg.layer_scale_conv,
            only_local=not cfg.hat[i], hierarchy=True,
            do_propagation=cfg.do_propagation, dynamic_mode=dynamic_mode,
            quantized=quantized, dtype=dtype, attn_impl=attn_impl,
            name=f"levels_{i}"))
    return levels


class FasterViT(nn.Module):
    """FasterViT classifier (reference FasterViT, faster_vit.py:846-972).

    Input is NHWC float; `training=True` switches BatchNorm to batch stats
    (mutable 'batch_stats' collection) and enables DropPath/Dropout (requires a
    'dropout' rng)."""
    cfg: FasterViTConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    quantized: bool = False   # int8 serving path (ops/quant.py)

    @nn.compact
    def __call__(self, x, training: bool = False,
                 return_features: bool = False):
        cfg = self.cfg
        x = PatchEmbed(in_dim=cfg.in_dim, dim=cfg.dim, dtype=self.dtype,
                       name="patch_embed")(x, training=training)
        for level in _build_levels(cfg, self.dtype, self.attn_impl,
                                   quantized=self.quantized):
            x = level(x, training=training)
        if cfg.layer_norm_last:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        else:
            x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        if return_features:
            return x
        x = jnp.mean(x, axis=(1, 2))  # global average pool (NHWC)
        if cfg.num_classes > 0:
            x = nn.Dense(cfg.num_classes, dtype=self.dtype,
                         kernel_init=trunc_normal_init, name="head")(x)
        return x


class FasterViTPyramid(nn.Module):
    """Feature-pyramid mode: per-stage pre-downsample features with per-stage
    norms, for detection/tracking backbones (reference
    downstream/object_detection/dino/models/dino/fastervit.py:705-707,
    792-846). The DINO backbone's per-stage norm is BatchNorm2d by default
    (fastervit.py:737); 'layernorm' selects the LayerNorm2d option.

    Returns a dict {'res2': (B,H/4,W/4,C), ..., 'res5': ...} of normalized
    NHWC stage outputs. Stage freezing (fastervit.py:801-812) is functional
    in JAX: use `frozen_param_labels` with optax.multi_transform /
    set_to_zero to freeze patch_embed / early levels."""
    cfg: FasterViTConfig
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    stage_norm: str = "batchnorm"  # 'batchnorm' | 'layernorm'
    dynamic_mode: bool = True      # downstream backbones use the dynamic variant
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, training: bool = False):
        cfg = self.cfg
        x = PatchEmbed(in_dim=cfg.in_dim, dim=cfg.dim, dtype=self.dtype,
                       name="patch_embed")(x, training=training)
        feats = {}
        for i, level in enumerate(_build_levels(cfg, self.dtype, self.attn_impl,
                                                self.dynamic_mode)):
            x, pre = level(x, training=training, return_pre_downsample=True)
            if i in self.out_indices:
                if self.stage_norm == "batchnorm":
                    pre = nn.BatchNorm(use_running_average=not training,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=f"norm_{i}")(pre)
                else:
                    pre = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       name=f"norm_{i}")(pre)
                feats[f"res{i + 2}"] = pre
        return feats


def frozen_param_labels(params, frozen_stages: int = -1):
    """Label pytree for optax.multi_transform: 'frozen' for patch_embed
    (frozen_stages >= 0) and levels_0..frozen_stages-2 (frozen_stages >= 2),
    matching the DINO backbone's _freeze_stages (fastervit.py:801-812);
    'trainable' otherwise."""
    import jax

    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if frozen_stages >= 0 and top == "patch_embed":
            return "frozen"
        if frozen_stages >= 2 and top.startswith("levels_"):
            if int(top.split("_")[1]) < frozen_stages - 1:
                return "frozen"
        return "trainable"

    return jax.tree_util.tree_map_with_path(label, params)
