"""Multi-Scale Deformable Attention (MSDA) — jnp implementation.

The reference's only native kernel (CUDA im2col/col2im,
downstream/object_detection/dino/models/dino/ops/src/cuda/
ms_deform_im2col_cuda.cuh:237+) behind the pure-torch oracle
`ms_deform_attn_core_pytorch` (ops/functions/ms_deform_attn_func.py:41-61).

This is the TPU-native equivalent: one `lax.gather` of contiguous
(2, 2, D) corner patches per (query, level, point) from a zero-padded level
map — 4x fewer gathers than the per-corner formulation, no masking in the
gather path (the border padding realizes grid_sample's zero padding), and
autodiff gives the backward (a patch scatter-add) for free where the
reference needed 6 hand-written col2im kernel variants. Semantics match
torch F.grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=False) exactly — verified in tests/test_msda.py against a
torch oracle. Measured on v5e at DINO-4scale 800x1333 shapes: 2.3x faster
than the per-corner take_along_axis formulation at encoder scale
(113 ms vs 259 ms, Q=S=22223).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def _gather_patches(op: jnp.ndarray, idx: jnp.ndarray, d: int) -> jnp.ndarray:
    """op: (Hp, Wp, D); idx: (Q, 2) int32 (y, x) starts -> (Q, 2, 2, D)."""
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    return lax.gather(op, idx, dn, slice_sizes=(2, 2, d),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray) -> jnp.ndarray:
    """value: (N, S, M, D) with S = sum(H*W); spatial_shapes static;
    sampling_locations: (N, Q, M, L, P, 2) in [0, 1];
    attention_weights: (N, Q, M, L, P) (softmax-normalized over L*P).
    Returns (N, Q, M*D)."""
    n, s, m, d = value.shape
    q = sampling_locations.shape[1]
    p = sampling_locations.shape[4]
    acc = jnp.zeros((n, q, m, d), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = lax.slice_in_dim(value, start, start + h * w, axis=1)
        start += h * w
        # (N, H*W, M, D) -> (N*M, H+2, W+2, D) with a zero border (realizes
        # grid_sample's zero padding; keeps every aligned patch in bounds)
        vm = v.reshape(n, h, w, m, d).transpose(0, 3, 1, 2, 4)
        vm = jnp.pad(vm, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        vm = vm.reshape(n * m, h + 2, w + 2, d)

        ll = sampling_locations[:, :, :, lvl]           # (N, Q, M, P, 2)
        # align_corners=False: pixel = loc * size - 0.5
        x = ll[..., 0] * w - 0.5
        y = ll[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        # a patch is representable iff its 2x2 corners fit the padded map;
        # farther-out samples contribute exactly zero
        valid = ((x0 >= -1) & (x0 <= w - 1) & (y0 >= -1)
                 & (y0 <= h - 1)).astype(jnp.float32)[..., None]
        ix = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
        iy = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
        idx = jnp.stack([iy, ix], -1).transpose(0, 2, 1, 3, 4)
        idx = idx.reshape(n * m, q * p, 2)
        patches = jax.vmap(functools.partial(_gather_patches, d=d))(vm, idx)
        patches = patches.reshape(n, m, q, p, 2, 2, d)
        patches = patches.transpose(0, 2, 1, 3, 4, 5, 6)  # (N,Q,M,P,2,2,D)
        interp = ((1 - fy) * (1 - fx) * patches[..., 0, 0, :]
                  + (1 - fy) * fx * patches[..., 0, 1, :]
                  + fy * (1 - fx) * patches[..., 1, 0, :]
                  + fy * fx * patches[..., 1, 1, :]) * valid
        acc = acc + jnp.sum(
            interp * attention_weights[:, :, :, lvl, :, None].astype(
                interp.dtype), axis=3)                   # (N, Q, M, D)
    assert start == s, (start, s)
    return acc.reshape(n, q, m * d).astype(value.dtype)


def _sampling_offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Directional bias init for the sampling-offset head (reference
    ops/modules/ms_deform_attn.py:47-60): head h points along angle
    2πh/n_heads, scaled by point index."""
    import numpy as np

    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * np.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)     # (M, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1

    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


class MSDeformAttnModule(nn.Module):
    """Deformable-attention layer (reference ops/modules/ms_deform_attn.py:
    30-126): value/offset/weight projections around ms_deform_attn."""
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, input_flatten, spatial_shapes,
                 padding_mask=None):
        """query: (N, Q, C); reference_points: (N, Q, L, 2) or (N, Q, L, 4)
        normalized; input_flatten: (N, S, C); spatial_shapes: static
        ((H, W), ...); padding_mask: (N, S) bool, True = pad."""
        n, q, _ = query.shape
        s = input_flatten.shape[1]
        m, l, p = self.n_heads, self.n_levels, self.n_points
        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(
            input_flatten)
        if padding_mask is not None:
            value = jnp.where(padding_mask[..., None], 0.0, value)
        value = value.reshape(n, s, m, self.d_model // m)

        offsets = nn.Dense(m * l * p * 2, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           bias_init=_sampling_offset_bias_init(m, l, p),
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(n, q, m, l, p, 2)
        weights = nn.Dense(m * l * p, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           name="attention_weights")(query)
        weights = jax.nn.softmax(weights.reshape(n, q, m, l * p), axis=-1)
        weights = weights.reshape(n, q, m, l, p)

        if reference_points.shape[-1] == 2:
            wh = jnp.asarray([[wd, ht] for ht, wd in spatial_shapes],
                             self.dtype)                      # (L, 2) as (W, H)
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / wh[None, None, None, :, None, :])
        elif reference_points.shape[-1] == 4:
            loc = (reference_points[:, :, None, :, None, :2]
                   + offsets / p * reference_points[:, :, None, :, None, 2:]
                   * 0.5)
        else:
            raise ValueError(reference_points.shape)

        out = ms_deform_attn(value, spatial_shapes, loc, weights)
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)
