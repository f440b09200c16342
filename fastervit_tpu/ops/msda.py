"""Multi-Scale Deformable Attention (MSDA) — jnp implementation.

The reference's only native kernel (CUDA im2col/col2im,
downstream/object_detection/dino/models/dino/ops/src/cuda/
ms_deform_im2col_cuda.cuh:237+) behind the pure-torch oracle
`ms_deform_attn_core_pytorch` (ops/functions/ms_deform_attn_func.py:41-61).

This is the TPU-native equivalent: batched bilinear gathers expressed as
take_along_axis so XLA lowers them to vectorized dynamic-gathers; autodiff
gives the backward for free (the reference needed 6 hand-written col2im
kernel variants). Semantics match torch F.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=False) exactly — verified in
tests/test_msda.py against a torch oracle.

A Pallas gather kernel can slot in behind the same signature later.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear_sample_level(value_l: jnp.ndarray, loc: jnp.ndarray,
                           h: int, w: int) -> jnp.ndarray:
    """Sample one level.

    value_l: (N, H*W, M, D); loc: (N, Q, M, P, 2) normalized [0,1] (x, y).
    Returns (N, Q, M, P, D).
    """
    n, _, m, d = value_l.shape
    q, p = loc.shape[1], loc.shape[3]
    # align_corners=False: pixel = loc * size - 0.5
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    out = jnp.zeros((n, q, m, p, d), value_l.dtype)
    for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            # gather (N, Q*P, M) indices along the flattened spatial axis
            idx_flat = idx.transpose(0, 1, 3, 2).reshape(n, q * p, m)
            g = jnp.take_along_axis(value_l, idx_flat[..., None], axis=1)
            g = g.reshape(n, q, p, m, d).transpose(0, 1, 3, 2, 4)
            wgt = (wy * wx * valid).astype(value_l.dtype)
            out = out + g * wgt[..., None]
    return out


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
    acc = jnp.zeros((n, q, m, d), value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.slice_in_dim(value, start, start + h * w, axis=1)
        start += h * w
        sampled = _bilinear_sample_level(value_l,
                                         sampling_locations[:, :, :, lvl], h, w)
        acc = acc + jnp.sum(
            sampled * attention_weights[:, :, :, lvl, :, None].astype(value.dtype),
            axis=3)                                          # (N, Q, M, D)
    assert start == s, (start, s)
    return acc.reshape(n, q, m * d)


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
