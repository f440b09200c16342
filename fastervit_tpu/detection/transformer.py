"""Deformable-DETR transformer (encoder/decoder over multi-scale features)
with DINO-style two-stage query selection and iterative box refinement —
the TPU rebuild of the reference's
downstream/object_detection/dino/models/dino/deformable_transformer.py
(encoder :26, decoder :446, two-stage selection :596-794).

Functional flax modules around fastervit_tpu.ops.msda; static multi-scale
shapes; everything jit-compatible.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fastervit_tpu.ops.msda import MSDeformAttnModule


def inverse_sigmoid(x, eps: float = 1e-3):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def sine_position_embedding(coords: jnp.ndarray, num_feats: int = 128,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """Sine embedding of normalized coords (..., D) -> (..., D*num_feats)."""
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos = coords[..., None] * 2 * math.pi / dim_t
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                    axis=-1).reshape(*coords.shape[:-1], -1)
    return pos


def encoder_reference_points(spatial_shapes: Sequence[Tuple[int, int]]):
    """Per-pixel normalized centers for each level: (S, L, 2) (static)."""
    pts = []
    for h, w in spatial_shapes:
        y, x = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                           indexing="ij")
        pts.append(np.stack([x.ravel() / w, y.ravel() / h], -1))
    ref = np.concatenate(pts, 0)                       # (S, 2)
    return jnp.asarray(np.tile(ref[:, None, :], (1, len(spatial_shapes), 1)),
                       jnp.float32)


class FFN(nn.Module):
    dim: int
    hidden: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        if self.dropout:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)
        if self.dropout:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x + h)
        return x


class EncoderLayer(nn.Module):
    dim: int = 256
    n_heads: int = 8
    n_points: int = 4
    n_levels: int = 4
    ffn_dim: int = 2048
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, ref_points, spatial_shapes, padding_mask=None,
                 deterministic=True):
        attn = MSDeformAttnModule(self.dim, self.n_levels, self.n_heads,
                                  self.n_points, dtype=self.dtype,
                                  name="self_attn")(
            src + pos, ref_points[None].repeat(src.shape[0], 0)
            if ref_points.ndim == 3 else ref_points,
            src, spatial_shapes, padding_mask)
        if self.dropout:
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + attn)
        return FFN(self.dim, self.ffn_dim, self.dropout, self.dtype,
                   name="ffn")(src, deterministic)


class DecoderLayer(nn.Module):
    dim: int = 256
    n_heads: int = 8
    n_points: int = 4
    n_levels: int = 4
    ffn_dim: int = 2048
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, ref_boxes, memory, spatial_shapes,
                 padding_mask=None, deterministic=True, self_attn_mask=None):
        q = tgt + query_pos
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, name="self_attn")(
            q, q, tgt,
            mask=self_attn_mask[None, None] if self_attn_mask is not None
            else None)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt + sa)
        # cross-attention samples around the current boxes (4d refs)
        ref = ref_boxes[:, :, None, :].repeat(self.n_levels, 2)  # (B,Q,L,4)
        ca = MSDeformAttnModule(self.dim, self.n_levels, self.n_heads,
                                self.n_points, dtype=self.dtype,
                                name="cross_attn")(
            tgt + query_pos, ref, memory, spatial_shapes, padding_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt + ca)
        return FFN(self.dim, self.ffn_dim, self.dropout, self.dtype,
                   name="ffn")(tgt, deterministic)


class MLPHead(nn.Module):
    hidden: int
    out: int
    layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                 name=f"layer_{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype,
                        name=f"layer_{self.layers - 1}")(x)


class DeformableTransformer(nn.Module):
    """Encoder + two-stage query selection + box-refining decoder."""
    dim: int = 256
    n_heads: int = 8
    n_points: int = 4
    enc_layers: int = 6
    dec_layers: int = 6
    ffn_dim: int = 2048
    num_queries: int = 900
    num_classes: int = 91
    dropout: float = 0.0
    # DINO defaults: box/class heads shared across decoder layers and a
    # shared final LayerNorm on decoder hidden states
    # (dec_pred_bbox_embed_share, deformable_transformer.py TransformerDecoder
    # self.norm). Box outputs are recorded undetached from the current
    # layer's update = look_forward_twice=True semantics.
    share_dec_heads: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, srcs, spatial_shapes, padding_mask=None,
                 deterministic=True, dn_labels=None, dn_boxes=None,
                 dn_attn_mask=None, track_tgt=None, track_boxes=None):
        """srcs: (B, S, C) flattened multi-scale features; returns dict with
        per-layer decoder logits/boxes + encoder proposals.

        Contrastive-denoising inputs (DINO CDN, reference
        dino/models/dino/dn_components semantics): dn_labels (B, N_dn) noised
        class ids embedded via label_enc, dn_boxes (B, N_dn, 4) noised gt
        anchors, dn_attn_mask (Q_total, Q_total) boolean allow-mask keeping
        dn groups and matching queries mutually blind. dn queries occupy the
        FIRST N_dn decoder slots of every output layer."""
        b, s, c = srcs.shape
        n_levels = len(spatial_shapes)
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (n_levels, self.dim))
        # positional encoding: sine of per-pixel centers + level embed
        ref_pts = encoder_reference_points(spatial_shapes)       # (S, L, 2)
        pos = sine_position_embedding(ref_pts[:, 0], self.dim // 2)  # (S, C)
        lvl = jnp.concatenate([
            jnp.tile(level_embed[i][None], (h * w, 1))
            for i, (h, w) in enumerate(spatial_shapes)], 0)
        pos = (pos + lvl)[None].astype(self.dtype)

        memory = srcs
        for i in range(self.enc_layers):
            memory = EncoderLayer(self.dim, self.n_heads, self.n_points,
                                  n_levels, self.ffn_dim, self.dropout,
                                  self.dtype, name=f"encoder_{i}")(
                memory, pos, ref_pts, spatial_shapes, padding_mask,
                deterministic)

        # --- two-stage: score encoder tokens, take top-k proposals ----------
        enc_logits = nn.Dense(self.num_classes, dtype=self.dtype,
                              name="enc_class")(memory)          # (B, S, K)
        anchors = []
        for lv, (h, w) in enumerate(spatial_shapes):
            y, x = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                               indexing="ij")
            wh = np.full((h * w, 2), 0.05 * 2 ** lv)
            anchors.append(np.concatenate(
                [np.stack([x.ravel() / w, y.ravel() / h], -1), wh], -1))
        anchors = jnp.asarray(np.concatenate(anchors, 0), jnp.float32)  # (S,4)
        enc_delta = MLPHead(self.dim, 4, dtype=self.dtype,
                            name="enc_bbox")(memory)             # (B, S, 4)
        enc_boxes = jax.nn.sigmoid(enc_delta + inverse_sigmoid(anchors)[None])

        k = min(self.num_queries, s)
        scores = jnp.max(enc_logits, axis=-1)                    # (B, S)
        topk = jax.lax.top_k(scores, k)[1]                       # (B, k)
        ref_boxes = jnp.take_along_axis(enc_boxes, topk[..., None], axis=1)
        ref_boxes = jax.lax.stop_gradient(ref_boxes)
        tgt = self.param("tgt_embed", nn.initializers.normal(1.0),
                         (self.num_queries, self.dim))[None, :k]
        tgt = jnp.tile(tgt, (b, 1, 1)).astype(self.dtype)

        if track_tgt is not None:
            # MOTR track queries join in front of the detect queries
            # (reference motr.py _forward_single_image: track ++ detect)
            tgt = jnp.concatenate([jnp.asarray(track_tgt, tgt.dtype), tgt], 1)
            ref_boxes = jnp.concatenate(
                [jnp.asarray(track_boxes, ref_boxes.dtype), ref_boxes], 1)
        if dn_labels is not None:
            dn_tgt = nn.Embed(self.num_classes + 1, self.dim,
                              dtype=self.dtype, name="label_enc")(dn_labels)
            tgt = jnp.concatenate([dn_tgt, tgt], axis=1)
            ref_boxes = jnp.concatenate(
                [jnp.asarray(dn_boxes, ref_boxes.dtype), ref_boxes], axis=1)

        # --- decoder with iterative refinement ------------------------------
        outputs = {"enc_logits": enc_logits, "enc_boxes": enc_boxes,
                   "logits": [], "boxes": [], "hidden": []}
        ref_point_head = MLPHead(self.dim, self.dim, layers=2,
                                 dtype=self.dtype, name="ref_point_head")
        dec_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                name="dec_norm")
        if self.share_dec_heads:
            bbox_heads = [MLPHead(self.dim, 4, dtype=self.dtype,
                                  name="bbox_embed")] * self.dec_layers
            class_heads = [nn.Dense(self.num_classes, dtype=self.dtype,
                                    name="class_embed")] * self.dec_layers
        else:
            bbox_heads = [MLPHead(self.dim, 4, dtype=self.dtype,
                                  name=f"bbox_head_{i}")
                          for i in range(self.dec_layers)]
            class_heads = [nn.Dense(self.num_classes, dtype=self.dtype,
                                    name=f"class_head_{i}")
                           for i in range(self.dec_layers)]
        for i in range(self.dec_layers):
            qp = ref_point_head(
                sine_position_embedding(ref_boxes, self.dim // 2))
            tgt = DecoderLayer(self.dim, self.n_heads, self.n_points,
                               n_levels, self.ffn_dim, self.dropout,
                               self.dtype, name=f"decoder_{i}")(
                tgt, qp, ref_boxes, memory, spatial_shapes, padding_mask,
                deterministic, self_attn_mask=dn_attn_mask)
            hidden = dec_norm(tgt)
            delta = bbox_heads[i](hidden)
            new_boxes = jax.nn.sigmoid(delta + inverse_sigmoid(ref_boxes))
            logits = class_heads[i](hidden)
            outputs["logits"].append(logits)
            outputs["boxes"].append(new_boxes)
            outputs["hidden"].append(hidden)
            ref_boxes = jax.lax.stop_gradient(new_boxes)
        return outputs
