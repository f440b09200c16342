"""MOTR-style end-to-end tracking head (reference
downstream/object_tracking/motrv2/models/motr.py:368 MOTR, qim.py:59
QueryInteractionModule, motr.py:36 ClipMatcher — rebuilt functional).

Design: a per-frame detector forward takes the previous frame's track
queries (embedding + reference box per live track) concatenated with the
learnable detect queries; after the frame, the Query Interaction Module
(QIM) refreshes surviving track queries. Track birth/death uses
tracking.tracker.RuntimeTracker thresholds. The per-frame step is a pure
function of (params, frame, track_state-pytree) so a clip fits in one jit /
lax.scan, and per-frame `jax.checkpoint` replaces the reference's custom
CheckpointFunction (util/checkpoint.py:14-40).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fastervit_tpu.detection.transformer import (DeformableTransformer, FFN,
                                                 inverse_sigmoid)
from fastervit_tpu.models.config import FasterViTConfig
from fastervit_tpu.models.fastervit import FasterViTPyramid
from fastervit_tpu.ops.boxes import (box_cxcywh_to_xyxy, generalized_box_iou,
                                     hungarian_cost_matrix, hungarian_match)


def pos2posemb(pos: jnp.ndarray, num_pos_feats: int = 64,
               temperature: float = 10000.0) -> jnp.ndarray:
    """Scalar/vector sine embedding (reference qim.py:184-191 /
    deformable_transformer_plus.py:392-399): (...,) -> (..., num_pos_feats)
    interleaved sin/cos."""
    import math

    scale = 2 * math.pi
    dim_t = temperature ** (2 * (np.arange(num_pos_feats) // 2)
                            / num_pos_feats)
    p = (pos * scale)[..., None] / jnp.asarray(dim_t, jnp.float32)
    return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                     axis=-1).reshape(*pos.shape, num_pos_feats)


class QueryInteractionModule(nn.Module):
    """QIMv2 (reference qim.py): refresh surviving track queries with
    self-attention + FFN over the frame's output embeddings."""
    dim: int = 256
    n_heads: int = 8
    ffn_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, track_embed, query_pos, deterministic: bool = True):
        q = track_embed + query_pos
        sa = nn.MultiHeadDotProductAttention(num_heads=self.n_heads,
                                             dtype=self.dtype,
                                             name="self_attn")(q, q, track_embed)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            track_embed + sa)
        return FFN(self.dim, self.ffn_dim, dtype=self.dtype, name="ffn")(
            x, deterministic)


class MOTRDetector(nn.Module):
    """Per-frame forward: pyramid features -> deformable transformer over
    [track queries ++ detect queries] -> per-query logits/boxes + refreshed
    track-query embeddings."""
    backbone_cfg: FasterViTConfig
    num_classes: int = 1
    dim: int = 256
    num_detect_queries: int = 60
    num_track_queries: int = 60     # fixed slots; inactive slots are masked
    num_proposal_queries: int = 0   # MOTRv2 YOLOX-proposal anchor queries
    enc_layers: int = 3
    dec_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, track_embed=None, track_boxes=None,
                 proposals=None, training: bool = False):
        """image: (B, H, W, 3); track_embed: (B, T, dim); track_boxes:
        (B, T, 4) cxcywh in [0,1]; proposals: (B, P, 5) external-detector
        proposals (cxcywh normalized + score) that become anchor queries —
        MOTRv2's headline trick (reference motr.py:464-473: ref_pts from the
        proposal box, query_pos = pos2posemb(score) + yolox_embed). Returns
        dict with 'logits'/'boxes' over T+P+Q queries (track slots first,
        then proposal slots) and 'query_embed' outputs."""
        b = image.shape[0]
        feats = FasterViTPyramid(self.backbone_cfg, dtype=self.dtype,
                                 name="backbone")(image, training=training)
        keys = sorted(feats)
        srcs, shapes = [], []
        for i, kname in enumerate(keys):
            x = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                        name=f"input_proj_{i}")(feats[kname])
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f"input_proj_norm_{i}")(x)
            _, h, w, _ = x.shape
            shapes.append((h, w))
            srcs.append(x.reshape(b, h * w, self.dim))
        src = jnp.concatenate(srcs, axis=1)

        # track queries occupy the first num_track_queries decoder slots
        # (reference motr.py: track ++ detect query concat); empty slots are
        # zero embeddings with centered anchors
        t = self.num_track_queries
        if track_embed is None:
            track_embed = jnp.zeros((b, t, self.dim), self.dtype)
        if track_boxes is None:
            track_boxes = jnp.tile(jnp.asarray([0.5, 0.5, 0.1, 0.1]),
                                   (b, t, 1))
        if self.num_proposal_queries:
            p = self.num_proposal_queries
            if proposals is None:   # zero-score centered padding proposals
                proposals = jnp.tile(
                    jnp.asarray([0.5, 0.5, 0.1, 0.1, 0.0]), (b, p, 1))
            yolox_embed = self.param("yolox_embed",
                                     nn.initializers.normal(1.0), (self.dim,))
            prop_tgt = (pos2posemb(proposals[..., 4], self.dim)
                        + yolox_embed).astype(self.dtype)
            track_embed = jnp.concatenate(
                [track_embed, prop_tgt], axis=1)
            track_boxes = jnp.concatenate(
                [track_boxes, proposals[..., :4]], axis=1)
        out = DeformableTransformer(
            dim=self.dim, num_queries=self.num_detect_queries,
            num_classes=self.num_classes, enc_layers=self.enc_layers,
            dec_layers=self.dec_layers, dtype=self.dtype,
            name="transformer")(src, tuple(shapes),
                                deterministic=not training,
                                track_tgt=track_embed,
                                track_boxes=track_boxes)
        logits = out["logits"][-1]
        boxes = out["boxes"][-1]
        # QIM consumes the decoder's last-layer hidden states (the reference's
        # track query embedding update, qim.py:59-64)
        hidden = out["hidden"][-1]
        refreshed = QueryInteractionModule(self.dim, dtype=self.dtype,
                                           name="qim")(
            hidden, jnp.zeros_like(hidden), deterministic=not training)
        return {"logits": logits, "boxes": boxes, "query_embed": refreshed,
                "aux": out}


@dataclasses.dataclass
class MOTRTrackState:
    """Per-sequence streaming state (host side): slot-indexed over the
    num_track_queries track slots, carrying the propagated query embeddings
    and reference boxes (the 'track instances' of submit_dance.py)."""
    ids: np.ndarray            # (T,) persistent identity or -1 if free
    scores: np.ndarray         # (T,)
    misses: np.ndarray         # (T,)
    embeds: np.ndarray         # (T, dim) query embeddings fed to next frame
    boxes: np.ndarray          # (T, 4) cxcywh reference boxes
    next_id: int = 0


def motr_inference_sequence(apply_fn, variables, frames,
                            num_track_slots: int, dim: int,
                            score_thresh: float = 0.7,
                            filter_thresh: float = 0.6,
                            miss_tolerance: int = 5,
                            proposals_per_frame=None) -> List[Dict]:
    """Streaming inference (reference submit_dance.py Detector.detect +
    motr.py:573-644): per frame, forward with the carried track queries,
    update/kill/bear tracks by score thresholds, propagate QIM-refreshed
    embeddings and predicted boxes to the next frame.

    apply_fn(variables, image, track_embed, track_boxes[, proposals]) -> the
    detector's output dict; track slots are the FIRST num_track_slots
    queries. proposals_per_frame: optional list of (P, 5) MOTRv2 proposals.
    """
    t = num_track_slots
    state = MOTRTrackState(
        ids=np.full(t, -1), scores=np.zeros(t), misses=np.zeros(t, int),
        embeds=np.zeros((t, dim), np.float32),
        boxes=np.tile(np.asarray([0.5, 0.5, 0.1, 0.1], np.float32), (t, 1)))
    results = []
    for fi, frame in enumerate(frames):
        if proposals_per_frame is not None:
            out = apply_fn(variables, frame[None], state.embeds[None],
                           state.boxes[None],
                           np.asarray(proposals_per_frame[fi],
                                      np.float32)[None])
        else:
            out = apply_fn(variables, frame[None], state.embeds[None],
                           state.boxes[None])
        scores = np.asarray(jax.nn.sigmoid(out["logits"][0]).max(-1))
        boxes = np.asarray(out["boxes"][0])
        embeds = np.asarray(out["query_embed"][0], np.float32)

        # existing tracks (slots 0..t)
        for qi in range(t):
            if state.ids[qi] < 0:
                continue
            if scores[qi] >= filter_thresh:
                state.misses[qi] = 0
                state.scores[qi] = scores[qi]
                state.embeds[qi] = embeds[qi]
                state.boxes[qi] = boxes[qi]
            else:
                state.misses[qi] += 1
                if state.misses[qi] >= miss_tolerance:
                    state.ids[qi] = -1
                    state.embeds[qi] = 0.0
                    state.boxes[qi] = (0.5, 0.5, 0.1, 0.1)
        # births: detect slots above threshold move into free track slots
        for qi in range(t, len(scores)):
            if scores[qi] < score_thresh:
                continue
            free = np.where(state.ids < 0)[0]
            if not len(free):
                break
            slot = free[0]
            state.ids[slot] = state.next_id
            state.next_id += 1
            state.misses[slot] = 0
            state.scores[slot] = scores[qi]
            state.embeds[slot] = embeds[qi]
            state.boxes[slot] = boxes[qi]
        active = (state.ids >= 0) & (state.misses == 0)
        results.append({
            "ids": state.ids[active].copy(),
            # host-side conversion (an eager jnp op per frame would be a
            # device round trip through the relay)
            "boxes": np.stack([
                state.boxes[active][:, 0] - 0.5 * state.boxes[active][:, 2],
                state.boxes[active][:, 1] - 0.5 * state.boxes[active][:, 3],
                state.boxes[active][:, 0] + 0.5 * state.boxes[active][:, 2],
                state.boxes[active][:, 1] + 0.5 * state.boxes[active][:, 3]],
                -1),
            "scores": state.scores[active].copy(),
        })
    return results


def motr_clip_forward(detector, params, batch_stats, frames,
                      propagate_boxes: bool = True, proposals=None):
    """Differentiable clip forward: per-frame detector forwards with the
    QIM-refreshed track-query embeddings (and optionally predicted boxes)
    propagated to the next frame — the structure MOTR trains through
    (reference motr.py:646-700; per-frame jax.checkpoint replaces the custom
    CheckpointFunction).

    frames: (F, B, H, W, 3); proposals: optional (F, B, P, 5) MOTRv2
    per-frame external proposals. Returns list of per-frame output dicts.
    """
    b = frames.shape[1]
    t, dim = detector.num_track_queries, detector.dim
    embed = jnp.zeros((b, t, dim))
    boxes = jnp.tile(jnp.asarray([0.5, 0.5, 0.1, 0.1]), (b, t, 1))

    def frame_fwd(p, bs, img, e, bx, props):
        return detector.apply({"params": p, "batch_stats": bs}, img,
                              track_embed=e, track_boxes=bx,
                              proposals=props, training=False)

    frame_fwd = jax.checkpoint(frame_fwd)
    outputs = []
    for f in range(frames.shape[0]):
        props = None if proposals is None else proposals[f]
        out = frame_fwd(params, batch_stats, frames[f], embed, boxes, props)
        outputs.append(out)
        embed = out["query_embed"][:, :t]
        bx = out["boxes"][-1][:, :t] if isinstance(out["boxes"], list) \
            else out["boxes"][:, :t]
        boxes = jax.lax.stop_gradient(bx) if propagate_boxes else boxes
    return outputs


def make_motr_clip_train_step(detector, tx, num_classes: int = 1):
    """Two-phase clip training: (A) no-grad clip forward -> host clip
    matching; (B) jitted grad step recomputing the propagated forward with
    the assignments fixed."""

    def clip_loss(params, batch_stats, frames, tgt_labels, tgt_boxes,
                  tgt_mask, assignment, proposals=None):
        from fastervit_tpu.detection.engine import detection_loss
        outs = motr_clip_forward(detector, params, batch_stats, frames,
                                 proposals=proposals)
        total = 0.0
        for f, out in enumerate(outs):
            loss, _ = detection_loss(
                {"logits": [out["logits"]], "boxes": [out["boxes"]]},
                {"labels": tgt_labels[f], "boxes": tgt_boxes[f],
                 "mask": tgt_mask[f]},
                assignment[f][None], num_classes)
            total = total + loss
        return total / len(outs)

    @jax.jit
    def train_step(params, batch_stats, opt_state, frames, tgt_labels,
                   tgt_boxes, tgt_mask, assignment, proposals=None):
        import optax
        loss, grads = jax.value_and_grad(clip_loss)(
            params, batch_stats, frames, tgt_labels, tgt_boxes, tgt_mask,
            assignment, proposals)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def motr_clip_train_epoch(detector, variables, opt_state, tx, clips,
                          max_targets: int = 10, num_classes: int = 1):
    """clips: iterable of (frames (F,B,H,W,3), per-frame-per-image targets
    with 'track_ids'[, proposals (F,B,P,5)]). Clip-consistent matching: a gt
    identity keeps its first-matched query slot across the clip
    (ClipMatcher, motr.py:36)."""
    from fastervit_tpu.detection.engine import pad_targets
    from fastervit_tpu.ops.boxes import hungarian_cost_matrix, hungarian_match

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    step = make_motr_clip_train_step(detector, tx, num_classes)
    fwd = jax.jit(lambda p, bs, fr, props: [
        jax.tree.map(jax.lax.stop_gradient, o)
        for o in motr_clip_forward(detector, p, bs, fr, proposals=props)])
    losses = []
    for clip in clips:
        frames, targets_per_frame = clip[0], clip[1]
        proposals = jnp.asarray(clip[2]) if len(clip) > 2 and clip[2] is not \
            None else None
        frames = jnp.asarray(frames)
        f, b = frames.shape[0], frames.shape[1]
        outs = fwd(params, batch_stats, frames, proposals)
        # clip-consistent assignment per image
        tgts = [pad_targets(tf, max_targets) for tf in targets_per_frame]
        assignment = np.full((f, b, max_targets), -1, np.int32)
        for bi in range(b):
            assigned: Dict[int, int] = {}
            for fi in range(f):
                tf = targets_per_frame[fi][bi]
                logits = np.asarray(outs[fi]["logits"][bi])
                boxes = np.asarray(outs[fi]["boxes"][bi])
                q = logits.shape[0]
                ids = list(map(int, tf["track_ids"]))
                new = [k for k, i in enumerate(ids) if i not in assigned]
                taken = [assigned[i] for i in ids if i in assigned]
                free = np.setdiff1d(np.arange(q), taken)
                if new:
                    cost = hungarian_cost_matrix(
                        jnp.asarray(logits[free]), jnp.asarray(boxes[free]),
                        jnp.asarray(np.asarray(tf["labels"])[new]),
                        jnp.asarray(np.asarray(tf["boxes"])[new]))
                    r, c = hungarian_match(np.asarray(cost))
                    for ri, ci in zip(r, c):
                        assigned[ids[new[ci]]] = int(free[ri])
                for k, i in enumerate(ids[:max_targets]):
                    assignment[fi, bi, k] = assigned[i]
        params, opt_state, loss = step(
            params, batch_stats, opt_state, frames,
            jnp.asarray(np.stack([t["labels"] for t in tgts])),
            jnp.asarray(np.stack([t["boxes"] for t in tgts])),
            jnp.asarray(np.stack([t["mask"] for t in tgts])),
            jnp.asarray(assignment), proposals)
        losses.append(float(loss))
    return ({"params": params, "batch_stats": batch_stats}, opt_state,
            {"loss": float(np.mean(losses))})


def clip_matcher_loss(per_frame_outputs: List[Dict],
                      per_frame_targets: List[Dict],
                      num_classes: int = 1) -> Dict[str, jnp.ndarray]:
    """ClipMatcher (reference motr.py:36): across a clip, a gt identity keeps
    the query slot it was first matched to; new identities are matched
    Hungarian-style among unassigned queries. Focal + L1 + GIoU losses."""
    from fastervit_tpu.detection.dino import sigmoid_focal_loss
    assigned: Dict[int, int] = {}   # gt track id -> query slot
    total = {"loss_ce": 0.0, "loss_bbox": 0.0, "loss_giou": 0.0}
    num_boxes = max(1, sum(len(t["labels"]) for t in per_frame_targets))
    for out, tgt in zip(per_frame_outputs, per_frame_targets):
        logits, boxes = out["logits"][0], out["boxes"][0]
        q = logits.shape[0]
        t_ids = list(map(int, tgt["track_ids"]))
        t_boxes = jnp.asarray(tgt["boxes"])
        t_labels = jnp.asarray(tgt["labels"])
        rows_fixed = [assigned[i] for i in t_ids if i in assigned]
        cols_fixed = [k for k, i in enumerate(t_ids) if i in assigned]
        new_cols = [k for k, i in enumerate(t_ids) if i not in assigned]
        free_rows = np.setdiff1d(np.arange(q), rows_fixed)
        if new_cols:
            cost = hungarian_cost_matrix(logits[free_rows],
                                         boxes[free_rows],
                                         t_labels[np.asarray(new_cols)],
                                         t_boxes[np.asarray(new_cols)])
            r, c = hungarian_match(np.asarray(jax.lax.stop_gradient(cost)))
            for ri, ci in zip(r, c):
                assigned[t_ids[new_cols[ci]]] = int(free_rows[ri])
        rows = [assigned[i] for i in t_ids]
        onehot = jnp.zeros((q, num_classes))
        if rows:
            rows_a = jnp.asarray(rows)
            onehot = onehot.at[rows_a].set(jax.nn.one_hot(t_labels, num_classes))
            pb, tb = boxes[rows_a], t_boxes
            total["loss_bbox"] += jnp.sum(jnp.abs(pb - tb)) / num_boxes
            giou = generalized_box_iou(box_cxcywh_to_xyxy(pb),
                                       box_cxcywh_to_xyxy(tb))
            total["loss_giou"] += jnp.sum(1 - jnp.diag(giou)) / num_boxes
        total["loss_ce"] += sigmoid_focal_loss(logits, onehot).sum() / num_boxes
    total["loss"] = (total["loss_ce"] + 5.0 * total["loss_bbox"]
                     + 2.0 * total["loss_giou"])
    return total
