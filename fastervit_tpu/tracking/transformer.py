"""Exact MOTRv2 deformable transformer (reference
motrv2/models/deformable_transformer_plus.py, in the configuration the
shipped recipe uses: self-cross decoder order, with_box_refine, no
two-stage, no memory bank, no extra_track_attn — configs/motrv2.args).

Structural deltas vs the DINO transformer (detection/transformer.py):

* queries: tgt is a learned embedding passed in (motr.py:466-473 builds it
  from query_embed.weight ++ proposal queries); reference points are given
  (position.weight ++ proposal boxes), NOT generated two-stage;
* per-layer query_pos = pos2posemb(reference_points) — a 4D sine embed of
  the CURRENT (refined) reference, not DINO's ref_point_head MLP
  (deformable_transformer_plus.py:425);
* iterative refinement detaches the reference each layer
  (deformable_transformer_plus.py:430-440); no look-forward-twice, no
  final decoder LayerNorm;
* the refinement bbox head lives inside the decoder and is shared with the
  model's per-layer output heads (motr.py:442-447 hack-shares them).

Encoder/decoder layers reuse detection.transformer.EncoderLayer /
DecoderLayer — deformable_transformer_plus and DINO's deformable
transformer share the layer structure (sa/ca/ffn, post-norm).

Weight conversion from reference checkpoints: tracking/convert.py;
parity: tests/test_motr_transformer_parity.py.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fastervit_tpu.detection.transformer import (DecoderLayer, EncoderLayer,
                                                 MLPHead, inverse_sigmoid)
from fastervit_tpu.tracking.motr import pos2posemb


def encoder_reference_points(spatial_shapes: Sequence[Tuple[int, int]]):
    """Per-level normalized center grid, unpadded (valid ratios 1)
    (deformable_transformer_plus.py:240-253)."""
    pts = []
    for (h, w) in spatial_shapes:
        ry = (np.arange(h, dtype=np.float32) + 0.5) / h
        rx = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ry, rx, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(pts, 0)                          # (S, 2)
    return np.broadcast_to(ref[:, None, :],
                           (ref.shape[0], len(spatial_shapes), 2)).copy()


class MOTRTransformer(nn.Module):
    dim: int = 256
    n_heads: int = 8
    n_points: int = 4
    enc_layers: int = 6
    dec_layers: int = 6
    ffn_dim: int = 1024
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # Lite-DETR-style speed mode: the stride-4 level (75% of the 102k
    # encoder tokens at 1536x800) is excluded from the encoder QUERY set but
    # stays in the sampled value maps, cutting the MSDA gather floor ~4x
    # (docs/perf_downstream.md). Off by default — changes numerics vs the
    # reference, so checkpoint-exact paths keep it disabled. Same params
    # either way (weights don't depend on the query split).
    lite_encoder: bool = False

    @nn.compact
    def __call__(self, srcs, spatial_shapes, pos_embeds, query_embed,
                 ref_pts, self_attn_mask=None, deterministic: bool = True):
        """srcs: (B, S, C) flattened multi-level features; pos_embeds:
        (B, S, C) sine position embeddings (level embed added here);
        query_embed: (B, Q, C) decoder targets; ref_pts: (B, Q, 4) initial
        reference boxes in [0, 1]; self_attn_mask: (Q, Q) bool, True =
        BLOCKED (torch MultiheadAttention convention).

        Returns dict: hidden (list per layer), refs (list per layer,
        post-refinement), init_ref."""
        n_levels = len(spatial_shapes)
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (n_levels, self.dim))
        pos = []
        start = 0
        for i, (h, w) in enumerate(spatial_shapes):
            pos.append(pos_embeds[:, start:start + h * w] + level_embed[i])
            start += h * w
        pos = jnp.concatenate(pos, axis=1).astype(self.dtype)

        ref_grid = jnp.asarray(encoder_reference_points(spatial_shapes),
                               self.dtype)
        memory = srcs
        if self.lite_encoder and n_levels > 1:
            s_lo = spatial_shapes[0][0] * spatial_shapes[0][1]
            lo = memory[:, :s_lo]          # stride-4 tokens: values only
            hi = memory[:, s_lo:]
            pos_hi, ref_hi = pos[:, s_lo:], ref_grid[s_lo:]
            for i in range(self.enc_layers):
                hi = EncoderLayer(self.dim, self.n_heads, self.n_points,
                                  n_levels, self.ffn_dim, self.dropout,
                                  self.dtype, name=f"encoder_{i}")(
                    hi, pos_hi, ref_hi, spatial_shapes, None, deterministic,
                    value=jnp.concatenate([lo, hi], axis=1))
            memory = jnp.concatenate([lo, hi], axis=1)
        else:
            for i in range(self.enc_layers):
                memory = EncoderLayer(self.dim, self.n_heads, self.n_points,
                                      n_levels, self.ffn_dim, self.dropout,
                                      self.dtype, name=f"encoder_{i}")(
                    memory, pos, ref_grid, spatial_shapes, None,
                    deterministic)

        # refinement bbox heads (decoder-resident, shared with the model's
        # output heads — motr.py:442-447)
        bbox_heads = [MLPHead(self.dim, 4, 3, dtype=self.dtype,
                              name=f"bbox_embed_{i}")
                      for i in range(self.dec_layers)]

        tgt = query_embed.astype(self.dtype)
        refs = jax.lax.stop_gradient(ref_pts.astype(self.dtype))
        init_ref = refs
        hidden_out, refs_out = [], []
        mask = None
        if self_attn_mask is not None:
            # flax attention masks are True = ATTEND
            mask = ~self_attn_mask
        for i in range(self.dec_layers):
            # 4 coords x (dim/4)-feat sine, coordinate-major flatten
            # (deformable_transformer_plus.py:392-399 flatten(-3))
            qp = pos2posemb(refs, self.dim // 4).reshape(
                refs.shape[0], refs.shape[1], self.dim).astype(self.dtype)
            ref_input = jnp.repeat(refs[:, :, None, :], n_levels, axis=2)
            tgt = DecoderLayer(self.dim, self.n_heads, self.n_points,
                               n_levels, self.ffn_dim, self.dropout,
                               self.dtype, name=f"decoder_{i}")(
                tgt, qp, ref_input, memory, spatial_shapes, None,
                deterministic, mask)
            delta = bbox_heads[i](tgt)
            # MOTR's util/misc.py inverse_sigmoid uses eps=1e-5 (vs DINO's
            # 1e-3); matters for boxes hugging the frame edge
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(refs, eps=1e-5))
            refs = jax.lax.stop_gradient(new_ref)
            hidden_out.append(tgt)
            refs_out.append(refs)
        return {"hidden": hidden_out, "refs": refs_out, "init_ref": init_ref}
