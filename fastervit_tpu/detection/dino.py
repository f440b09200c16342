"""DINO-style detector on a FasterViT pyramid backbone + set criterion +
postprocessing (reference downstream/object_detection/dino/models/dino/
dino.py:38 DINO, :344 SetCriterion, :655 PostProcess — rebuilt functional).

4-scale detector with two-stage deformable transformer, focal-loss
Hungarian criterion (class + L1 + GIoU, aux losses per decoder layer),
top-k postprocess, and exact contrastive denoising (CDN) training
(`prepare_cdn` / `cdn_loss` below, reference dn_components.py
prepare_for_cdn/dn_post_process).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fastervit_tpu.detection.transformer import DeformableTransformer
from fastervit_tpu.models.config import FasterViTConfig
from fastervit_tpu.models.fastervit import FasterViTPyramid
from fastervit_tpu.ops.boxes import (box_cxcywh_to_xyxy,
                                     generalized_box_iou,
                                     hungarian_cost_matrix, hungarian_match)


class DINODetector(nn.Module):
    """Backbone pyramid -> 1x1 input projections (+GroupNorm) -> deformable
    transformer -> per-layer class/box predictions."""
    backbone_cfg: FasterViTConfig
    num_classes: int = 91
    dim: int = 256
    num_queries: int = 900
    enc_layers: int = 6
    dec_layers: int = 6
    num_feature_levels: int = 4
    # which backbone pyramid levels feed the transformer (reference
    # return_interm_indices, backbone.py:124: [1,2,3] for 4scale = strides
    # 8/16/32, [0,1,2,3] for 5scale = strides 4/8/16/32; extra stride-2
    # conv levels fill up to num_feature_levels)
    return_interm_indices: tuple = (1, 2, 3)
    remat: bool = False        # per-layer activation checkpointing
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, training: bool = False, dn=None,
                 pad_mask=None):
        """images: (B, H, W, 3); pad_mask: optional (B, H, W) bool, True at
        zero-padded pixels (NestedTensor mask). The mask downsamples per
        pyramid level (reference dino.py:250-262 F.interpolate-to-bool) and
        drives the transformer's valid-ratio path."""
        feats = FasterViTPyramid(self.backbone_cfg, dtype=self.dtype,
                                 name="backbone")(images, training=training)
        # reference 4-scale geometry (dino.py:97-112, 250-262 +
        # backbone return_interm_indices=[1,2,3], config DINO_*.py:31):
        # backbone strides 8/16/32 through 1x1 proj + GroupNorm, then extra
        # levels from 3x3 stride-2 projections — the first on the RAW last
        # backbone feature, subsequent ones on the previous projected level
        all_keys = sorted(feats)                       # res2..res5
        keys = [all_keys[i] for i in self.return_interm_indices]
        srcs, shapes, masks = [], [], []

        def _append(x, b, h, w):
            shapes.append((h, w))
            srcs.append(x.reshape(b, h * w, self.dim))
            if pad_mask is not None:
                m = jax.image.resize(pad_mask.astype(jnp.float32),
                                     (b, h, w), "nearest") > 0.5
                masks.append(m.reshape(b, h * w))

        for i, kname in enumerate(keys[:self.num_feature_levels]):
            f = feats[kname]
            x = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                        name=f"input_proj_{i}")(f)
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f"input_proj_norm_{i}")(x)
            _append(x, *x.shape[:3])
        prev = feats[keys[-1]]
        for i in range(len(keys), self.num_feature_levels):
            x = nn.Conv(self.dim, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name=f"input_proj_{i}")(prev)
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f"input_proj_norm_{i}")(x)
            _append(x, *x.shape[:3])
            prev = x
        src = jnp.concatenate(srcs, axis=1)
        flat_mask = jnp.concatenate(masks, axis=1) if masks else None
        out = DeformableTransformer(
            dim=self.dim, num_queries=self.num_queries,
            num_classes=self.num_classes, enc_layers=self.enc_layers,
            dec_layers=self.dec_layers, remat=self.remat, dtype=self.dtype,
            name="transformer")(src, tuple(shapes),
                                padding_mask=flat_mask,
                                deterministic=not training,
                                dn_labels=dn["labels"] if dn else None,
                                dn_boxes=dn["boxes"] if dn else None,
                                dn_attn_mask=dn["attn_mask"] if dn else None)
        return out


def build_dino_from_config(cfg, dtype=jnp.float32) -> DINODetector:
    """Build a DINODetector from a PyConfig (the reference's
    build_dino(args) path, dino/main.py:84-90 + models/dino/dino.py:707,
    configs under configs/dino/)."""
    from fastervit_tpu.models.registry import get_config

    backbone_cfg = get_config(cfg["backbone"],
                              **cfg.get("backbone_overrides", {}))
    return DINODetector(
        backbone_cfg=backbone_cfg,
        num_classes=cfg.get("num_classes", 91),
        dim=cfg.get("hidden_dim", 256),
        num_queries=cfg.get("num_queries", 900),
        enc_layers=cfg.get("enc_layers", 6),
        dec_layers=cfg.get("dec_layers", 6),
        num_feature_levels=cfg.get("num_feature_levels", 4),
        return_interm_indices=tuple(cfg.get("return_interm_indices",
                                            [1, 2, 3])),
        remat=cfg.get("use_checkpoint", False),
        dtype=dtype)


# ------------- contrastive denoising (DINO CDN, dn_components) -----------------

def prepare_cdn(rng, tgt_padded: Dict, num_classes: int, num_queries: int,
                dn_number: int = 100, label_noise_ratio: float = 0.5,
                box_noise_scale: float = 1.0,
                dn_groups: Optional[int] = None):
    """Build denoising queries from padded gt (engine.pad_targets format) —
    exact prepare_for_cdn semantics (reference dn_components.py:20-137):

    - the group count adapts so total dn slots stay ~2*dn_number:
      groups = dn_number // max_gt, computed here from the STATIC padded
      target count so every step compiles once (dn_components.py:35-47);
    - box noise jitters the xyxy CORNERS independently by
      U[0,1) (+1 for negatives) * sign * (w/2, h/2) * scale, clamped to
      [0, 1], then converts back to cxcywh (dn_components.py:75-92);
    - label noise flips any dn label with prob ratio*0.5
      (dn_components.py:63-67);
    - the attention mask blinds matching queries to dn slots and dn groups
      to each other, but dn CAN see the matching queries
      (dn_components.py:113-124).

    Each group carries one positive (regress to gt) and one negative
    (background) query per gt slot; layout (B, G, 2, T), dn slots first.
    """
    labels, boxes, mask = (jnp.asarray(tgt_padded["labels"]),
                           jnp.asarray(tgt_padded["boxes"]),
                           jnp.asarray(tgt_padded["mask"]))
    b, t = labels.shape
    if dn_groups is None:
        g = max(1, dn_number // max(t, 1))
    else:
        g = dn_groups
    r_lbl, r_flip, r_sign, r_part = jax.random.split(rng, 4)

    # (B, G, 2, T): group-major, positive part then negative part
    lbl = jnp.tile(labels[:, None, None, :], (1, g, 2, 1))
    flip = jax.random.uniform(r_flip, lbl.shape) < (label_noise_ratio * 0.5)
    rand_lbl = jax.random.randint(r_lbl, lbl.shape, 0, num_classes)
    lbl = jnp.where(flip, rand_lbl, lbl)
    # invalid slots get the 'no object' embedding index
    lbl = jnp.where(mask[:, None, None, :], lbl, num_classes)

    bx = jnp.tile(boxes[:, None, None, :, :], (1, g, 2, 1, 1))  # (B,G,2,T,4)
    xyxy = jnp.concatenate([bx[..., :2] - bx[..., 2:] / 2,
                            bx[..., :2] + bx[..., 2:] / 2], -1)
    diff = jnp.concatenate([bx[..., 2:] / 2, bx[..., 2:] / 2], -1)
    sign = jax.random.randint(r_sign, bx.shape, 0, 2).astype(
        jnp.float32) * 2.0 - 1.0
    part = jax.random.uniform(r_part, bx.shape)
    part = part.at[:, :, 1].add(1.0)          # negatives push further out
    xyxy = jnp.clip(xyxy + sign * part * diff * box_noise_scale, 0.0, 1.0)
    bx = jnp.concatenate([(xyxy[..., :2] + xyxy[..., 2:]) / 2,
                          xyxy[..., 2:] - xyxy[..., :2]], -1)
    bx = jnp.clip(bx, 1e-3, 1 - 1e-3)

    n_dn = g * 2 * t
    dn = {"labels": lbl.reshape(b, n_dn),
          "boxes": bx.reshape(b, n_dn, 4)}

    # allow-mask (True = may attend): matching queries cannot see dn; dn
    # groups cannot see each other; dn CAN see matching queries
    q_total = n_dn + num_queries
    allow = np.zeros((q_total, q_total), bool)
    allow[n_dn:, n_dn:] = True
    allow[:n_dn, n_dn:] = True
    gsz = 2 * t
    for gi in range(g):
        s0 = gi * gsz
        allow[s0:s0 + gsz, s0:s0 + gsz] = True
    dn["attn_mask"] = jnp.asarray(allow)
    meta = {"n_dn": n_dn, "groups": g, "t": t}
    return dn, meta


def cdn_loss(outputs: Dict, tgt_padded: Dict, meta: Dict, num_classes: int,
             weight_bbox: float = 5.0, weight_giou: float = 2.0):
    """Denoising loss with KNOWN assignment: positive dn slot (g, 0, k) ↔ gt
    slot k; negatives and padded slots are background."""
    labels, boxes, mask = (jnp.asarray(tgt_padded["labels"]),
                           jnp.asarray(tgt_padded["boxes"]),
                           jnp.asarray(tgt_padded["mask"]))
    b, t = labels.shape
    g, n_dn = meta["groups"], meta["n_dn"]
    num_boxes = jnp.maximum(mask.sum(), 1) * g
    total = {"loss_ce_dn": 0.0, "loss_bbox_dn": 0.0, "loss_giou_dn": 0.0}
    for li in range(len(outputs["logits"])):
        logits = outputs["logits"][li][:, :n_dn].reshape(b, g, 2, t, -1)
        pred = outputs["boxes"][li][:, :n_dn].reshape(b, g, 2, t, 4)
        pos_t = (jax.nn.one_hot(labels, num_classes)
                 * mask[..., None])[:, None, :, :]             # (B,1,T,K)
        onehot = jnp.stack([jnp.tile(pos_t, (1, g, 1, 1)),
                            jnp.zeros((b, g, t, num_classes))], axis=2)
        total["loss_ce_dn"] += sigmoid_focal_loss(
            logits, onehot).sum() / num_boxes
        pb = pred[:, :, 0]                                     # positives
        l1 = jnp.abs(pb - boxes[:, None]).sum(-1)
        total["loss_bbox_dn"] += jnp.where(mask[:, None], l1, 0.0).sum() / num_boxes
        giou = jax.vmap(jax.vmap(lambda a, c: jnp.diagonal(
            generalized_box_iou(box_cxcywh_to_xyxy(a),
                                box_cxcywh_to_xyxy(c)))))(
            pb, jnp.tile(boxes[:, None], (1, g, 1, 1)))
        total["loss_giou_dn"] += jnp.where(mask[:, None], 1 - giou,
                                           0.0).sum() / num_boxes
    total["loss_dn"] = (total["loss_ce_dn"] + weight_bbox * total["loss_bbox_dn"]
                        + weight_giou * total["loss_giou_dn"])
    return total


# ---------------- losses (SetCriterion, dino.py:344) ---------------------------

def sigmoid_focal_loss(logits, targets, alpha: float = 0.25,
                       gamma: float = 2.0):
    p = jax.nn.sigmoid(logits)
    ce = -(targets * jax.nn.log_sigmoid(logits)
           + (1 - targets) * jax.nn.log_sigmoid(-logits))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = loss * (alpha * targets + (1 - alpha) * (1 - targets))
    return loss


def criterion(outputs: Dict, targets: List[Dict], num_classes: int,
              weight_class: float = 1.0, weight_bbox: float = 5.0,
              weight_giou: float = 2.0) -> Dict[str, jnp.ndarray]:
    """Hungarian set criterion over all decoder layers (aux losses included).

    targets: per-image dicts {'labels': (T,), 'boxes': (T, 4) cxcywh in [0,1]}.
    Matching runs on host (tiny LPs); losses are jnp.
    """
    total = {"loss_ce": 0.0, "loss_bbox": 0.0, "loss_giou": 0.0}
    logits_l = list(outputs["logits"])
    boxes_l = list(outputs["boxes"])
    if "interm_logits" in outputs:
        # encoder top-k (interm) aux loss, matched like a decoder layer
        # (reference dino.py:302-307 interm_outputs in the criterion)
        logits_l.append(outputs["interm_logits"])
        boxes_l.append(outputs["interm_boxes"])
    num_layers = len(logits_l)
    num_boxes = max(1, sum(len(t["labels"]) for t in targets))
    for li in range(num_layers):
        logits = logits_l[li]
        boxes = boxes_l[li]
        for bi, tgt in enumerate(targets):
            t_labels = jnp.asarray(tgt["labels"])
            t_boxes = jnp.asarray(tgt["boxes"])
            q = logits.shape[1]
            onehot = jnp.zeros((q, num_classes))
            if len(t_labels):
                cost = hungarian_cost_matrix(
                    logits[bi], boxes[bi], t_labels, t_boxes,
                    cost_class=2.0, cost_bbox=weight_bbox,
                    cost_giou=weight_giou)
                rows, cols = hungarian_match(np.asarray(
                    jax.lax.stop_gradient(cost)))
                onehot = onehot.at[rows].set(
                    jax.nn.one_hot(t_labels[cols], num_classes))
                pb = boxes[bi][rows]
                tb = t_boxes[cols]
                total["loss_bbox"] += jnp.sum(jnp.abs(pb - tb)) / num_boxes
                giou = generalized_box_iou(box_cxcywh_to_xyxy(pb),
                                           box_cxcywh_to_xyxy(tb))
                total["loss_giou"] += jnp.sum(1 - jnp.diag(giou)) / num_boxes
            total["loss_ce"] += sigmoid_focal_loss(
                logits[bi], onehot).sum() / num_boxes
    scale = 1.0  # already summed over layers (DETR aux-loss convention)
    total = {k: v * scale for k, v in total.items()}
    total["loss"] = (weight_class * total["loss_ce"]
                     + weight_bbox * total["loss_bbox"]
                     + weight_giou * total["loss_giou"])
    return total


def postprocess(outputs: Dict, target_sizes, num_select: int = 300):
    """Top-k detections from the last decoder layer
    (reference PostProcess, dino.py:655): returns per-image
    {'scores', 'labels', 'boxes' (xyxy, absolute)}."""
    logits = outputs["logits"][-1]
    boxes = outputs["boxes"][-1]
    b, q, k = logits.shape
    prob = jax.nn.sigmoid(logits).reshape(b, q * k)
    scores, idx = jax.lax.top_k(prob, num_select)
    labels = idx % k
    qidx = idx // k
    xyxy = box_cxcywh_to_xyxy(jnp.take_along_axis(boxes, qidx[..., None],
                                                  axis=1))
    h, w = target_sizes[..., 0], target_sizes[..., 1]
    scale = jnp.stack([w, h, w, h], -1)[:, None, :]
    return {"scores": scores, "labels": labels, "boxes": xyxy * scale}
