"""Checkpoint-exact MOTRv2 detector assembly.

Reference motr.py MOTR in the shipped configuration (configs/motrv2.args:
with_box_refine, QIMv2, no memory bank): backbone pyramid (all four
strides, motr.py:399-414) -> per-level 1x1+GroupNorm projections -> DETR
sine position embeddings (position_encoding.py:12-41, N_steps = dim/2,
normalize=True) -> exact MOTRTransformer (tracking/transformer.py) ->
per-layer class/box heads where the box head is the decoder-shared
refinement head (motr.py:442-447, 545-556).

QIMv2 (qim.py:64-175 _update_track_embedding, eval semantics): positives
(score > 0.5) anchor on their predicted box; self-attention over track
queries with q = k = pos2posemb(ref) + output_embedding; FFN; a second FFN
produces the refreshed query features, applied to positive slots.

Weight conversion: tracking/convert.py convert_motr_checkpoint.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fastervit_tpu.models.config import FasterViTConfig
from fastervit_tpu.models.fastervit import FasterViTPyramid
from fastervit_tpu.tracking.motr import pos2posemb
from fastervit_tpu.tracking.transformer import MOTRTransformer


def sine_position_embedding(h: int, w: int, num_pos_feats: int,
                            temperature: float = 10000.0) -> np.ndarray:
    """DETR PositionEmbeddingSine, normalize=True, no padding
    (position_encoding.py:25-41): returns (h, w, 2*num_pos_feats) with the
    y-embedding first."""
    scale = 2 * math.pi
    eps = 1e-6
    y = (np.arange(1, h + 1, dtype=np.float32) - 0.5) / (h + eps) * scale
    x = (np.arange(1, w + 1, dtype=np.float32) - 0.5) / (w + eps) * scale
    dim_t = temperature ** (2 * (np.arange(num_pos_feats) // 2)
                            / num_pos_feats)
    py = y[:, None] / dim_t                     # (h, F)
    px = x[:, None] / dim_t
    py = np.stack([np.sin(py[:, 0::2]), np.cos(py[:, 1::2])],
                  -1).reshape(h, num_pos_feats)
    px = np.stack([np.sin(px[:, 0::2]), np.cos(px[:, 1::2])],
                  -1).reshape(w, num_pos_feats)
    pos = np.concatenate([np.broadcast_to(py[:, None], (h, w, num_pos_feats)),
                          np.broadcast_to(px[None], (h, w, num_pos_feats))],
                         axis=-1)
    return pos.astype(np.float32)


class QIMv2(nn.Module):
    """QueryInteractionModulev2 track-embedding update (qim.py:147-175),
    update_query_pos=False (the motrv2 default): operates on per-slot
    arrays, is_pos selects slots whose query features refresh."""
    dim: int = 256
    hidden: int = 1024

    @nn.compact
    def __call__(self, output_embedding, query_pos_feat, ref_pts, scores,
                 active_mask=None):
        """All (B, T, ...); active_mask (B, T) bool restricts the
        self-attention to the active track set (the reference runs QIM on
        exactly that subset, qim.py:136-145; masking the complement is
        equivalent for the active rows). Returns the new query features."""
        is_pos = (scores > 0.5)[..., None]
        # positives anchor on their predicted boxes (caller passes
        # pred_boxes through ref_pts update before the embed update)
        qp = pos2posemb(ref_pts, self.dim // 4).reshape(
            ref_pts.shape[0], ref_pts.shape[1], self.dim)
        q = qp + output_embedding
        tgt = output_embedding
        mask = None
        if active_mask is not None:
            # rows attend only active columns; every row keeps itself so
            # softmax stays defined for inactive rows (their output is
            # discarded by the caller)
            t = active_mask.shape[-1]
            mask = active_mask[:, None, None, :] | jnp.eye(t, dtype=bool)
        sa = nn.MultiHeadDotProductAttention(num_heads=8,
                                             name="self_attn")(q, q, tgt,
                                                               mask=mask)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + sa)
        h = nn.Dense(self.hidden, name="linear1")(tgt)
        h = nn.Dense(self.dim, name="linear2")(nn.relu(h))
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + h)
        f = nn.Dense(self.hidden, name="linear_feat1")(tgt)
        f = nn.Dense(self.dim, name="linear_feat2")(nn.relu(f))
        feat = nn.LayerNorm(epsilon=1e-5,
                            name="norm_feat")(query_pos_feat + f)
        return jnp.where(is_pos, feat, query_pos_feat)


class MOTRDetectorExact(nn.Module):
    """Reference-weight-compatible MOTR forward for one frame."""
    backbone_cfg: FasterViTConfig
    num_classes: int = 1
    dim: int = 256
    num_queries: int = 10
    enc_layers: int = 6
    dec_layers: int = 6
    ffn_dim: int = 1024
    dtype: jnp.dtype = jnp.float32
    lite_encoder: bool = False   # see MOTRTransformer.lite_encoder

    @nn.compact
    def __call__(self, image, query_pos, ref_pts, self_attn_mask=None,
                 training: bool = False):
        """image (B, H, W, 3); query_pos (B, T, dim) query features
        (reference 'query_pos' naming, motr.py:466-473: learned
        query_embed rows ++ proposal sine embeds, carried across frames);
        ref_pts (B, T, 4); self_attn_mask (T, T) bool, True = BLOCKED
        (used by the streaming loop to mask padded track slots). Returns
        per-layer logits/boxes + hidden."""
        b = image.shape[0]
        # learned query/anchor tables (motr.py:395, 427, 438: query_embed
        # embedding, position uniform(0,1) anchors, yolox proposal embed) —
        # consumed by empty_track_queries on the host between frames
        self.param("query_embed", nn.initializers.normal(1.0),
                   (self.num_queries, self.dim))
        self.param("position", nn.initializers.uniform(1.0),
                   (self.num_queries, 4))
        self.param("yolox_embed", nn.initializers.normal(1.0), (self.dim,))
        feats = FasterViTPyramid(self.backbone_cfg, dtype=self.dtype,
                                 name="backbone")(image, training=training)
        keys = sorted(feats)                       # all 4 strides, motr.py:400
        srcs, shapes, pos = [], [], []
        for i, k in enumerate(keys):
            x = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                        name=f"input_proj_{i}")(feats[k])
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f"input_proj_norm_{i}")(x)
            _, h, w, _ = x.shape
            shapes.append((h, w))
            srcs.append(x.reshape(b, h * w, self.dim))
            pe = sine_position_embedding(h, w, self.dim // 2)
            pos.append(jnp.broadcast_to(
                jnp.asarray(pe).reshape(1, h * w, self.dim),
                (b, h * w, self.dim)))
        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(pos, axis=1)

        out = MOTRTransformer(dim=self.dim, enc_layers=self.enc_layers,
                              dec_layers=self.dec_layers,
                              ffn_dim=self.ffn_dim, dtype=self.dtype,
                              lite_encoder=self.lite_encoder,
                              name="transformer")(
            src, tuple(shapes), pos, query_pos, ref_pts,
            self_attn_mask=self_attn_mask, deterministic=not training)
        logits = [nn.Dense(self.num_classes, dtype=self.dtype,
                           name=f"class_embed_{i}")(out["hidden"][i])
                  for i in range(self.dec_layers)]
        # per-layer boxes equal the decoder's internal refinement values
        # (shared bbox heads, motr.py:545-556)
        return {"logits": logits, "boxes": out["refs"],
                "hidden": out["hidden"], "init_ref": out["init_ref"]}


def empty_track_queries(variables, num_queries: int, dim: int,
                        proposals: Optional[np.ndarray] = None):
    """_generate_empty_tracks (motr.py:465-489): learned query_embed rows +
    position anchors, optionally extended with proposal queries
    (pos2posemb(score) + yolox_embed, boxes as anchors)."""
    params = variables["params"]
    qe = np.asarray(params["query_embed"])          # (Q, dim)
    posw = np.asarray(params["position"])           # (Q, 4)
    if proposals is None:
        return qe[None], posw[None]
    score_emb = np.asarray(pos2posemb(jnp.asarray(proposals[:, 4]), dim))
    yolox = np.asarray(params["yolox_embed"])
    qp = np.concatenate([qe, score_emb + yolox], 0)
    rp = np.concatenate([posw, proposals[:, :4]], 0)
    return qp[None], rp[None]


def exact_inference_sequence(apply_fn, qim_fn, variables, frames,
                             num_queries: int, dim: int,
                             proposals_per_frame=None,
                             num_proposals: int = 10,
                             track_capacity: int = 50,
                             score_thresh: float = 0.6,
                             filter_score_thresh: float = 0.5,
                             miss_tolerance: int = 10,
                             prob_threshold: Optional[float] = None):
    """Streaming inference with the reference's exact per-frame semantics
    (motr.py inference_single_image + _post_process_single_image +
    RuntimeTrackerBase, eval path):

    per frame the query set is [fresh detect queries ++ fresh proposal
    queries ++ carried track slots] (motr.py:617-621 concatenates new
    empties FIRST); scores = sigmoid(logits[..., 0]); the track base births
    at score_thresh, filters at filter_score_thresh with miss_tolerance
    (motr.py:302-326); QIMv2 refreshes the ACTIVE tracks' query features
    and anchors positives on their predicted boxes, producing the carried
    set for the next frame.

    The dynamic track set rides in `track_capacity` padded slots; padded
    slots are masked out of the decoder's and QIM's self-attention, which
    reproduces the reference's variable-size computation with static
    shapes.

    apply_fn(variables, image, query_pos, ref_pts, self_attn_mask) -> the
    detector output dict; qim_fn(out_embed, query_feat, ref_pts, scores,
    active_mask) -> refreshed query features.
    """
    def _cxcywh_to_xyxy_np(b):
        # host-side: an eager jnp op here would be a device round trip
        # per frame through the relay
        cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        return np.stack([cx - 0.5 * w, cy - 0.5 * h,
                         cx + 0.5 * w, cy + 0.5 * h], -1)

    cap = track_capacity
    fresh = num_queries + num_proposals
    total = fresh + cap
    # carried state (host): padded slot arrays
    t_valid = np.zeros(cap, bool)
    t_obj = np.full(cap, -1, np.int64)
    t_disappear = np.zeros(cap, np.int64)
    t_qp = np.zeros((cap, dim), np.float32)
    t_ref = np.full((cap, 4), 0.5, np.float32)
    next_id = 0
    results = []
    for fi, frame in enumerate(frames):
        props = None
        if proposals_per_frame is not None:
            props = np.asarray(proposals_per_frame[fi], np.float32)
        qp_new, rp_new = empty_track_queries(variables, num_queries, dim,
                                             proposals=props)
        qp = np.concatenate([qp_new[0], t_qp], 0)
        rp = np.concatenate([rp_new[0], t_ref], 0)
        valid = np.concatenate([np.ones(fresh, bool), t_valid])
        # torch convention: True = BLOCKED; block padded columns
        attn_mask = np.broadcast_to(~valid[None, :], (total, total)).copy()
        np.fill_diagonal(attn_mask, False)
        out = apply_fn(variables, frame[None], jnp.asarray(qp)[None],
                       jnp.asarray(rp)[None],
                       jnp.asarray(attn_mask))
        logits = np.asarray(out["logits"][-1][0, :, 0])
        boxes = np.asarray(out["boxes"][-1][0])
        hidden = np.asarray(out["hidden"][-1][0])
        scores = 1.0 / (1.0 + np.exp(-logits))

        # RuntimeTrackerBase.update over all valid slots
        obj = np.concatenate([np.full(fresh, -1, np.int64), t_obj])
        disappear = np.concatenate([np.zeros(fresh, np.int64), t_disappear])
        disappear[scores >= score_thresh] = 0
        new_obj = valid & (obj == -1) & (scores >= score_thresh)
        obj[new_obj] = next_id + np.arange(new_obj.sum())
        next_id += int(new_obj.sum())
        gone = valid & (obj >= 0) & (scores < filter_score_thresh)
        disappear[gone] += 1
        obj[gone & (disappear >= miss_tolerance)] = -1

        active = valid & (obj >= 0)
        # written detections additionally pass the reference's per-frame
        # score filter (submit_dance.py:146 filter_dt_by_score with
        # prob_threshold); coasting tracks below it are still CARRIED to
        # the next frame, just not emitted. The area>100px filter runs in
        # the caller once boxes are in original-image pixels.
        emit_thr = score_thresh if prob_threshold is None else prob_threshold
        emit = active & (scores > emit_thr)
        results.append({
            "ids": obj[emit].copy(),
            "boxes": _cxcywh_to_xyxy_np(boxes[emit]),
            "scores": scores[emit].copy(),
        })

        # QIMv2 on the active set; anchors positives on predicted boxes
        refs_q = np.where((scores > 0.5)[:, None], boxes, rp)
        new_feat = np.asarray(qim_fn(
            jnp.asarray(hidden)[None], jnp.asarray(qp)[None],
            jnp.asarray(refs_q)[None], jnp.asarray(scores)[None],
            jnp.asarray(active)[None])[0])

        # repack actives into the carried slots for the next frame
        idx = np.nonzero(active)[0][:cap]
        k = len(idx)
        t_valid = np.zeros(cap, bool)
        t_valid[:k] = True
        t_obj = np.full(cap, -1, np.int64)
        t_obj[:k] = obj[idx]
        t_disappear = np.zeros(cap, np.int64)
        t_disappear[:k] = disappear[idx]
        t_qp = np.zeros((cap, dim), np.float32)
        t_qp[:k] = new_feat[idx]
        t_ref = np.full((cap, 4), 0.5, np.float32)
        t_ref[:k] = refs_q[idx]
    return results
