"""Deformable-DETR transformer (encoder/decoder over multi-scale features)
with DINO-style two-stage query selection and iterative box refinement —
the TPU rebuild of the reference's
downstream/object_detection/dino/models/dino/deformable_transformer.py
(encoder :446, decoder :596, two-stage selection :327-431).

Numerics follow the reference exactly (for converted-checkpoint parity):
- sine embeddings use the (y, x, w, h) 128-feat interleaved sin/cos layout of
  gen_sineembed_for_position (dino/models/dino/utils.py:151-177);
- encoder memory pos-embed is PositionEmbeddingSineHW with temperature 20
  (position_encoding.py:64-135, config pe_temperatureH/W=20) plus level embed;
- two-stage proposals are inverse-sigmoid grid anchors with wh=0.05*2^lvl,
  masked to +inf outside (0.01, 0.99) (utils.py:19-76), scored through the
  enc_output Linear+LayerNorm projection and separate enc_out_{class,bbox}
  heads (deformable_transformer.py:334-371);
- the decoder refines boxes from the *unnormed* layer output while reported
  per-layer boxes/logits come from the shared-LayerNorm hidden states
  (deformable_transformer.py:757-790 vs dino.py:280-291), with
  look_forward_twice gradient flow (undetached ref recorded per layer).

Functional flax modules around fastervit_tpu.ops.msda; static multi-scale
shapes; everything jit-compatible (no padding masks: TPU batches are fixed
resolution, valid_ratios == 1).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fastervit_tpu.ops.msda import MSDeformAttnModule


def inverse_sigmoid(x, eps: float = 1e-3):
    """util/misc.py inverse_sigmoid: clamp to [eps, 1] then logit."""
    x = jnp.clip(x, 0, 1)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


def _interleaved_sincos(coord: jnp.ndarray, num_feats: int,
                        temperature: float) -> jnp.ndarray:
    """(...,) coords -> (..., num_feats) as [sin f0, cos f0, sin f1, ...] —
    the stack(sin(p[0::2]), cos(p[1::2])).flatten layout every reference
    embedding uses (utils.py:161, position_encoding.py:57-58)."""
    dim_t = temperature ** (2 * (np.arange(num_feats) // 2) / num_feats)
    p = coord[..., None] / jnp.asarray(dim_t, jnp.float32)
    return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                     axis=-1).reshape(*coord.shape, num_feats)


def gen_sineembed(pos: jnp.ndarray, num_feats: int = 128) -> jnp.ndarray:
    """gen_sineembed_for_position (utils.py:151-177): (..., 2|4) normalized
    coords -> (..., 2|4 * num_feats), ordered (y, x[, w, h])."""
    scale = 2 * math.pi
    parts = [_interleaved_sincos(pos[..., 1] * scale, num_feats, 10000.0),
             _interleaved_sincos(pos[..., 0] * scale, num_feats, 10000.0)]
    if pos.shape[-1] == 4:
        parts.append(_interleaved_sincos(pos[..., 2] * scale, num_feats,
                                         10000.0))
        parts.append(_interleaved_sincos(pos[..., 3] * scale, num_feats,
                                         10000.0))
    return jnp.concatenate(parts, axis=-1)


def position_embedding_sine_hw(spatial_shapes: Sequence[Tuple[int, int]],
                               num_pos_feats: int = 128,
                               temperature_h: float = 20.0,
                               temperature_w: float = 20.0) -> np.ndarray:
    """PositionEmbeddingSineHW (position_encoding.py:64-135) for unpadded
    inputs, flattened over all levels: (S, 2*num_pos_feats) float32.

    y_embed = cumsum of ones = row+1 normalized by the last row (H) + eps;
    channel layout cat(y-block, x-block), each interleaved sin/cos."""
    eps = 1e-6
    scale = 2 * math.pi
    out = []
    dim_ty = temperature_h ** (2 * (np.arange(num_pos_feats) // 2)
                               / num_pos_feats)
    dim_tx = temperature_w ** (2 * (np.arange(num_pos_feats) // 2)
                               / num_pos_feats)
    for h, w in spatial_shapes:
        y = (np.arange(h, dtype=np.float32) + 1.0) / (h + eps) * scale
        x = (np.arange(w, dtype=np.float32) + 1.0) / (w + eps) * scale
        py = y[:, None] / dim_ty                       # (H, F)
        px = x[:, None] / dim_tx                       # (W, F)
        py = np.stack([np.sin(py[:, 0::2]), np.cos(py[:, 1::2])],
                      -1).reshape(h, num_pos_feats)
        px = np.stack([np.sin(px[:, 0::2]), np.cos(px[:, 1::2])],
                      -1).reshape(w, num_pos_feats)
        lvl = np.concatenate([np.repeat(py[:, None], w, 1),
                              np.repeat(px[None], h, 0)], -1)   # (H, W, 2F)
        out.append(lvl.reshape(h * w, 2 * num_pos_feats))
    return np.concatenate(out, 0).astype(np.float32)


def encoder_reference_points(spatial_shapes: Sequence[Tuple[int, int]]):
    """Per-pixel normalized centers for each level: (S, L, 2) (static;
    get_reference_points with valid_ratios == 1,
    deformable_transformer.py:489-503)."""
    pts = []
    for h, w in spatial_shapes:
        y, x = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                           indexing="ij")
        pts.append(np.stack([x.ravel() / w, y.ravel() / h], -1))
    ref = np.concatenate(pts, 0)                       # (S, 2)
    return jnp.asarray(np.tile(ref[:, None, :], (1, len(spatial_shapes), 1)),
                       jnp.float32)


def _level_masks(padding_mask: jnp.ndarray,
                 spatial_shapes: Sequence[Tuple[int, int]]):
    """(B, S) flattened -> per-level (B, h, w) bool masks (True = padded)."""
    b = padding_mask.shape[0]
    out, start = [], 0
    for h, w in spatial_shapes:
        out.append(padding_mask[:, start:start + h * w].reshape(b, h, w))
        start += h * w
    return out


def valid_ratios_from_mask(padding_mask: jnp.ndarray,
                           spatial_shapes: Sequence[Tuple[int, int]]):
    """get_valid_ratio per level (deformable_transformer.py:252-259):
    (B, S) -> (B, L, 2) as (ratio_w, ratio_h)."""
    out = []
    for m in _level_masks(padding_mask, spatial_shapes):
        not_m = ~m
        h, w = m.shape[1], m.shape[2]
        valid_h = jnp.sum(not_m[:, :, 0].astype(jnp.float32), 1)
        valid_w = jnp.sum(not_m[:, 0, :].astype(jnp.float32), 1)
        out.append(jnp.stack([valid_w / w, valid_h / h], -1))
    return jnp.stack(out, 1)                            # (B, L, 2)


def encoder_reference_points_masked(spatial_shapes, valid_ratios):
    """get_reference_points with true valid ratios
    (deformable_transformer.py:489-503): (B, S, L, 2)."""
    pts = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        y, x = np.meshgrid(np.arange(h, dtype=np.float32) + 0.5,
                           np.arange(w, dtype=np.float32) + 0.5,
                           indexing="ij")
        grid = jnp.asarray(np.stack([x.ravel(), y.ravel()], -1))   # (hw, 2)
        scale = valid_ratios[:, None, lvl] * jnp.asarray([w, h],
                                                         jnp.float32)
        pts.append(grid[None] / scale)                  # (B, hw, 2)
    ref = jnp.concatenate(pts, 1)                       # (B, S, 2)
    return ref[:, :, None, :] * valid_ratios[:, None]   # (B, S, L, 2)


def position_embedding_sine_hw_masked(padding_mask, spatial_shapes,
                                      num_pos_feats: int = 128,
                                      temperature_h: float = 20.0,
                                      temperature_w: float = 20.0):
    """PositionEmbeddingSineHW from the real padding mask (cumsum-normalized,
    position_encoding.py:81-135): (B, S) -> (B, S, 2*num_pos_feats)."""
    eps = 1e-6
    scale = 2 * math.pi
    dim_ty = jnp.asarray(temperature_h ** (2 * (np.arange(num_pos_feats) // 2)
                                           / num_pos_feats), jnp.float32)
    dim_tx = jnp.asarray(temperature_w ** (2 * (np.arange(num_pos_feats) // 2)
                                           / num_pos_feats), jnp.float32)

    def interleave(p):
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                         -1).reshape(*p.shape[:-1], num_pos_feats)

    out = []
    for m in _level_masks(padding_mask, spatial_shapes):
        nm = (~m).astype(jnp.float32)
        b, h, w = nm.shape
        y = jnp.cumsum(nm, 1)
        x = jnp.cumsum(nm, 2)
        y = y / (y[:, -1:, :] + eps) * scale
        x = x / (x[:, :, -1:] + eps) * scale
        py = interleave(y[..., None] / dim_ty)          # (B, h, w, F)
        px = interleave(x[..., None] / dim_tx)
        out.append(jnp.concatenate([py, px], -1).reshape(b, h * w,
                                                         2 * num_pos_feats))
    return jnp.concatenate(out, 1)


def output_proposals(spatial_shapes: Sequence[Tuple[int, int]]):
    """gen_encoder_output_proposals anchors (utils.py:34-65), unpadded:
    returns (proposals_logit (S, 4) with +inf at invalid rows, valid (S,)
    bool) as numpy statics."""
    props = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        grid = np.stack([(gx.ravel() + 0.5) / w, (gy.ravel() + 0.5) / h], -1)
        wh = np.full((h * w, 2), 0.05 * (2.0 ** lvl), np.float32)
        props.append(np.concatenate([grid, wh], -1))
    p = np.concatenate(props, 0)                        # (S, 4)
    valid = ((p > 0.01) & (p < 0.99)).all(-1)
    logit = np.log(p / (1 - p))
    logit[~valid] = np.inf
    return logit.astype(np.float32), valid


def output_proposals_masked(padding_mask, spatial_shapes, valid_ratios):
    """gen_encoder_output_proposals with a real padding mask
    (utils.py:34-76): grid centers over the VALID extent, +inf logits at
    padded/out-of-range positions. Returns (logit (B, S, 4), valid (B, S))."""
    b = padding_mask.shape[0]
    props = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        grid = jnp.asarray(np.stack([gx.ravel() + 0.5, gy.ravel() + 0.5],
                                    -1))                        # (hw, 2)
        scale = valid_ratios[:, None, lvl] * jnp.asarray([w, h],
                                                         jnp.float32)
        grid = grid[None] / scale                               # (B, hw, 2)
        wh = jnp.full((b, h * w, 2), 0.05 * (2.0 ** lvl))
        props.append(jnp.concatenate([grid, wh], -1))
    p = jnp.concatenate(props, 1)                               # (B, S, 4)
    in_range = ((p > 0.01) & (p < 0.99)).all(-1)
    valid = in_range & ~padding_mask
    logit = jnp.log(p / (1 - p))
    logit = jnp.where(valid[..., None], logit, jnp.inf)
    return logit, valid


class FFN(nn.Module):
    """linear1 -> relu -> linear2 residual + LayerNorm (forward_ffn,
    deformable_transformer.py:831-835/909-913)."""
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
    """DeformableTransformerEncoderLayer (deformable_transformer.py:796-850):
    MSDA self-attn (+pos on query) -> norm1 -> FFN(norm2)."""
    dim: int = 256
    n_heads: int = 8
    n_points: int = 4
    n_levels: int = 4
    ffn_dim: int = 2048
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, ref_points, spatial_shapes, padding_mask=None,
                 deterministic=True, value=None):
        """value: optional (B, S_value, C) flattened level maps to sample
        from when the query set is a subset of the memory (lite-encoder
        mode); defaults to src (standard self-MSDA). Same params either
        way — the value projection weights don't depend on the split."""
        attn = MSDeformAttnModule(self.dim, self.n_levels, self.n_heads,
                                  self.n_points, dtype=self.dtype,
                                  name="self_attn")(
            src + pos, ref_points[None].repeat(src.shape[0], 0)
            if ref_points.ndim == 3 else ref_points,
            src if value is None else value, spatial_shapes, padding_mask)
        if self.dropout:
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + attn)
        return FFN(self.dim, self.ffn_dim, self.dropout, self.dtype,
                   name="ffn")(src, deterministic)


class DecoderLayer(nn.Module):
    """DeformableTransformerDecoderLayer (deformable_transformer.py:852-1014),
    module_seq ['sa','ca','ffn']: self-attn (q=k=tgt+query_pos, v=tgt, norm2)
    -> MSDA cross-attn on tgt+query_pos (norm1) -> FFN (norm3)."""
    dim: int = 256
    n_heads: int = 8
    n_points: int = 4
    n_levels: int = 4
    ffn_dim: int = 2048
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, ref_input, memory, spatial_shapes,
                 padding_mask=None, deterministic=True, self_attn_mask=None):
        """ref_input: per-level reference boxes (B, Q, L, 4) — the box itself
        at every level when unpadded, valid-ratio-scaled otherwise
        (deformable_transformer.py:704-710)."""
        q = tgt + query_pos
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, name="self_attn")(
            q, q, tgt,
            mask=self_attn_mask[None, None] if self_attn_mask is not None
            else None)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt + sa)
        ca = MSDeformAttnModule(self.dim, self.n_levels, self.n_heads,
                                self.n_points, dtype=self.dtype,
                                name="cross_attn")(
            tgt + query_pos, ref_input, memory, spatial_shapes, padding_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt + ca)
        return FFN(self.dim, self.ffn_dim, self.dropout, self.dtype,
                   name="ffn")(tgt, deterministic)


class MLPHead(nn.Module):
    """util MLP: Linear stack with relu between (dino.py MLP)."""
    hidden: int
    out: int
    layers: int = 3
    dtype: jnp.dtype = jnp.float32
    zero_init_last: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                 name=f"layer_{i}")(x))
        last_init = (nn.initializers.zeros if self.zero_init_last
                     else nn.initializers.lecun_normal())
        return nn.Dense(self.out, dtype=self.dtype, kernel_init=last_init,
                        bias_init=nn.initializers.zeros,
                        name=f"layer_{self.layers - 1}")(x)


def _focal_bias(num_classes: int):
    """class head bias init at prior_prob 0.01 (dino.py:135-137)."""
    v = -math.log((1 - 0.01) / 0.01)
    return nn.initializers.constant(v)


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
    # DINO defaults: box/class heads shared across decoder layers
    # (dec_pred_bbox_embed_share) and a shared final LayerNorm on decoder
    # hidden states; the internal refinement chain uses the unnormed output
    # while reported boxes use the normed hidden (deformable_transformer.py
    # :757-790 vs dino.py:280-291). Undetached refs are recorded per layer =
    # look_forward_twice=True gradient flow.
    share_dec_heads: bool = True
    dn_labelbook_size: int = 91
    remat: bool = False     # per-layer activation checkpointing (reference
                            # use_checkpoint, config DINO_*.py:25) — needed
                            # to fit the backward in HBM at DINO scales
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, srcs, spatial_shapes, padding_mask=None,
                 deterministic=True, dn_labels=None, dn_boxes=None,
                 dn_attn_mask=None, track_tgt=None, track_boxes=None):
        """srcs: (B, S, C) flattened multi-scale features; returns dict with
        per-layer decoder logits/boxes + encoder (interm) proposals.

        Contrastive-denoising inputs (DINO CDN, reference
        dino/models/dino/dn_components semantics): dn_labels (B, N_dn) noised
        class ids embedded via label_enc, dn_boxes (B, N_dn, 4) noised gt
        anchors (sigmoid space), dn_attn_mask (Q_total, Q_total) boolean
        allow-mask keeping dn groups and matching queries mutually blind. dn
        queries occupy the FIRST N_dn decoder slots of every output layer."""
        b, s, c = srcs.shape
        n_levels = len(spatial_shapes)
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (n_levels, self.dim))
        # positional encoding: SineHW(temperature 20) + level embed
        # (deformable_transformer.py:280-292). With a padding mask, the
        # embedding and reference points follow the per-image valid extents
        # (valid_ratios); unpadded inputs use precomputed constants.
        if padding_mask is not None:
            valid_ratios = valid_ratios_from_mask(padding_mask,
                                                  spatial_shapes)  # (B,L,2)
            ref_pts = encoder_reference_points_masked(
                spatial_shapes, valid_ratios)                    # (B,S,L,2)
            pos = position_embedding_sine_hw_masked(
                padding_mask, spatial_shapes, self.dim // 2)     # (B,S,C)
        else:
            valid_ratios = None
            ref_pts = encoder_reference_points(spatial_shapes)   # (S, L, 2)
            pos = jnp.asarray(position_embedding_sine_hw(
                spatial_shapes, self.dim // 2))[None]            # (1, S, C)
        lvl = jnp.concatenate([
            jnp.tile(level_embed[i][None], (h * w, 1))
            for i, (h, w) in enumerate(spatial_shapes)], 0)
        pos = (pos + lvl[None]).astype(self.dtype)

        # static_argnums index from self=0: spatial_shapes / deterministic
        enc_cls = (nn.remat(EncoderLayer, static_argnums=(4, 6))
                   if self.remat else EncoderLayer)
        memory = srcs
        for i in range(self.enc_layers):
            memory = enc_cls(self.dim, self.n_heads, self.n_points,
                             n_levels, self.ffn_dim, self.dropout,
                             self.dtype, name=f"encoder_{i}")(
                memory, pos, ref_pts, spatial_shapes, padding_mask,
                deterministic)

        # --- two-stage: gen_encoder_output_proposals + enc_output projection
        # (deformable_transformer.py:329-371) -------------------------------
        if padding_mask is not None:
            proposals_logit, valid = output_proposals_masked(
                padding_mask, spatial_shapes, valid_ratios)
            out_memory = memory * valid[..., None].astype(memory.dtype)
        else:
            proposals_logit, valid = output_proposals(spatial_shapes)
            out_memory = memory * jnp.asarray(valid,
                                              memory.dtype)[None, :, None]
        out_memory = nn.Dense(self.dim, dtype=self.dtype,
                              name="enc_output")(out_memory)
        out_memory = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name="enc_output_norm")(out_memory)
        enc_out_class = nn.Dense(self.num_classes, dtype=self.dtype,
                                 bias_init=_focal_bias(self.num_classes),
                                 name="enc_out_class_embed")
        enc_logits = enc_out_class(out_memory)
        enc_delta = MLPHead(self.dim, 4, dtype=self.dtype,
                            zero_init_last=True,
                            name="enc_out_bbox_embed")(out_memory)
        proposals_b = (jnp.asarray(proposals_logit)[None]
                       if proposals_logit.ndim == 2 else proposals_logit)
        enc_unsig = enc_delta + proposals_b                      # (B, S, 4)

        k = min(self.num_queries, s)
        scores = jnp.max(enc_logits, axis=-1)                    # (B, S)
        topk = jax.lax.top_k(scores, k)[1]                       # (B, k)
        ref_undetach = jnp.take_along_axis(
            enc_unsig, topk[..., None], axis=1)                  # unsigmoid
        ref_boxes = jax.nn.sigmoid(jax.lax.stop_gradient(ref_undetach))
        init_proposals = jax.nn.sigmoid(jnp.take_along_axis(
            jnp.broadcast_to(proposals_b, (b, s, 4)),
            topk[..., None], axis=1))
        tgt_undetach = jnp.take_along_axis(
            out_memory, topk[..., None], axis=1)                 # (B, k, C)
        # embed_init_tgt=True (DINO default): learned queries
        tgt = self.param("tgt_embed", nn.initializers.normal(1.0),
                         (self.num_queries, self.dim))[None, :k]
        tgt = jnp.tile(tgt, (b, 1, 1)).astype(self.dtype)

        # encoder auxiliary (interm) outputs: class head re-applied to the
        # gathered memory, boxes = sigmoid of the undetached gathered refs
        # (dino.py:302-307)
        interm_logits = enc_out_class(tgt_undetach)   # shares the enc head
        interm_boxes = jax.nn.sigmoid(ref_undetach)

        if track_tgt is not None:
            # MOTR track queries join in front of the detect queries
            # (reference motr.py _forward_single_image: track ++ detect)
            tgt = jnp.concatenate([jnp.asarray(track_tgt, tgt.dtype), tgt], 1)
            ref_boxes = jnp.concatenate(
                [jnp.asarray(track_boxes, ref_boxes.dtype), ref_boxes], 1)
        if dn_labels is not None:
            dn_tgt = nn.Embed(self.dn_labelbook_size + 1, self.dim,
                              dtype=self.dtype, name="label_enc")(dn_labels)
            tgt = jnp.concatenate([dn_tgt, tgt], axis=1)
            ref_boxes = jnp.concatenate(
                [jnp.asarray(dn_boxes, ref_boxes.dtype), ref_boxes], axis=1)

        # --- decoder with iterative refinement ------------------------------
        outputs: Dict = {"enc_logits": enc_logits, "enc_boxes":
                         jax.nn.sigmoid(enc_unsig),
                         "interm_logits": interm_logits,
                         "interm_boxes": interm_boxes,
                         "init_proposals": init_proposals,
                         "logits": [], "boxes": [], "hidden": []}
        ref_point_head = MLPHead(self.dim, self.dim, layers=2,
                                 dtype=self.dtype, name="ref_point_head")
        dec_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                name="dec_norm")
        if self.share_dec_heads:
            bbox_heads = [MLPHead(self.dim, 4, dtype=self.dtype,
                                  zero_init_last=True,
                                  name="bbox_embed")] * self.dec_layers
            class_heads = [nn.Dense(self.num_classes, dtype=self.dtype,
                                    bias_init=_focal_bias(self.num_classes),
                                    name="class_embed")] * self.dec_layers
        else:
            bbox_heads = [MLPHead(self.dim, 4, dtype=self.dtype,
                                  zero_init_last=True,
                                  name=f"bbox_head_{i}")
                          for i in range(self.dec_layers)]
            class_heads = [nn.Dense(self.num_classes, dtype=self.dtype,
                                    bias_init=_focal_bias(self.num_classes),
                                    name=f"class_head_{i}")
                           for i in range(self.dec_layers)]
        # look_forward_twice: per-layer reported refs are the undetached
        # refinement from the previous layer (ref_points list in the
        # reference decoder, deformable_transformer.py:784-788)
        report_ref = ref_boxes
        for i in range(self.dec_layers):
            # per-level reference input, valid-ratio-scaled under padding
            # (deformable_transformer.py:704-710); the query sine embed uses
            # the level-0 scaled reference (line 711)
            if valid_ratios is not None:
                vr4 = jnp.concatenate([valid_ratios, valid_ratios], -1)
                ref_input = ref_boxes[:, :, None, :] * vr4[:, None]
            else:
                ref_input = jnp.repeat(ref_boxes[:, :, None, :], n_levels, 2)
            qp = ref_point_head(gen_sineembed(ref_input[:, :, 0],
                                              self.dim // 2))
            dec_cls = (nn.remat(DecoderLayer, static_argnums=(5, 7))
                       if self.remat else DecoderLayer)
            tgt = dec_cls(self.dim, self.n_heads, self.n_points,
                          n_levels, self.ffn_dim, self.dropout,
                          self.dtype, name=f"decoder_{i}")(
                tgt, qp, ref_input, memory, spatial_shapes, padding_mask,
                deterministic, dn_attn_mask)
            hidden = dec_norm(tgt)
            # internal refinement on the unnormed output
            # (deformable_transformer.py:761-765)
            new_ref = jax.nn.sigmoid(bbox_heads[i](tgt)
                                     + inverse_sigmoid(ref_boxes))
            # reported outputs from the normed hidden + this layer's input
            # (undetached) ref (dino.py:280-291)
            out_box = jax.nn.sigmoid(bbox_heads[i](hidden)
                                     + inverse_sigmoid(report_ref))
            outputs["logits"].append(class_heads[i](hidden))
            outputs["boxes"].append(out_box)
            outputs["hidden"].append(hidden)
            report_ref = new_ref                     # undetached (lft)
            ref_boxes = jax.lax.stop_gradient(new_ref)
        return outputs
