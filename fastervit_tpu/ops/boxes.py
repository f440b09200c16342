"""Box operations + Hungarian matcher for the detection/tracking heads
(reference dino/util/box_ops.py and models/dino/matcher.py semantics)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def box_cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.moveaxis(b, -1, 0)
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b):
    x0, y0, x1, y1 = jnp.moveaxis(b, -1, 0)
    return jnp.stack([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_area(b):
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(a, b):
    """Pairwise IoU: a (N, 4), b (M, 4) xyxy -> iou (N, M), union (N, M)."""
    area_a = box_area(a)[:, None]
    area_b = box_area(b)[None, :]
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-9), union


def generalized_box_iou(a, b):
    """GIoU (reference dino/util/box_ops.py generalized_box_iou)."""
    iou, union = box_iou(a, b)
    lt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-9)


def hungarian_cost_matrix(pred_logits, pred_boxes, tgt_labels, tgt_boxes,
                          cost_class: float = 2.0, cost_bbox: float = 5.0,
                          cost_giou: float = 2.0, focal_alpha: float = 0.25,
                          focal_gamma: float = 2.0):
    """DETR-style matcher cost with focal class cost (reference
    dino/models/dino/matcher.py HungarianMatcher.forward): pred_logits
    (Q, C), pred_boxes (Q, 4) cxcywh; tgt_labels (T,), tgt_boxes (T, 4)."""
    prob = jax.nn.sigmoid(pred_logits)
    neg = (1 - focal_alpha) * prob ** focal_gamma * (-jnp.log1p(-prob + 1e-8))
    pos = focal_alpha * (1 - prob) ** focal_gamma * (-jnp.log(prob + 1e-8))
    cost_cls = pos[:, tgt_labels] - neg[:, tgt_labels]
    cost_l1 = jnp.sum(jnp.abs(pred_boxes[:, None] - tgt_boxes[None]), -1)
    cost_g = -generalized_box_iou(box_cxcywh_to_xyxy(pred_boxes),
                                  box_cxcywh_to_xyxy(tgt_boxes))
    return cost_class * cost_cls + cost_bbox * cost_l1 + cost_giou * cost_g


def hungarian_match(cost: np.ndarray):
    """Solve the assignment on host (scipy); returns (row_idx, col_idx).
    The cost matrix is computed on device, the tiny LP on CPU — the JAX
    equivalent of the reference's scipy linear_sum_assignment call."""
    from scipy.optimize import linear_sum_assignment
    return linear_sum_assignment(np.asarray(cost))


def _iou_terms(b1, b2):
    """Shared CIoU/DIoU terms for aligned box pairs in the reference's
    (sigmoid cx, sigmoid cy, exp w, exp h) parameterization
    (dino/util/box_loss.py:7-56)."""
    b1 = jax.nn.sigmoid(b1)
    b2 = jax.nn.sigmoid(b2)
    w1, h1 = jnp.exp(b1[..., 2]), jnp.exp(b1[..., 3])
    w2, h2 = jnp.exp(b2[..., 2]), jnp.exp(b2[..., 3])
    cx1, cy1 = b1[..., 0], b1[..., 1]
    cx2, cy2 = b2[..., 0], b2[..., 1]
    inter_w = jnp.clip(jnp.minimum(cx1 + w1 / 2, cx2 + w2 / 2)
                       - jnp.maximum(cx1 - w1 / 2, cx2 - w2 / 2), 0)
    inter_h = jnp.clip(jnp.minimum(cy1 + h1 / 2, cy2 + h2 / 2)
                       - jnp.maximum(cy1 - h1 / 2, cy2 - h2 / 2), 0)
    inter = inter_w * inter_h
    union = w1 * h1 + w2 * h2 - inter
    iou = inter / union
    c_w = jnp.clip(jnp.maximum(cx1 + w1 / 2, cx2 + w2 / 2)
                   - jnp.minimum(cx1 - w1 / 2, cx2 - w2 / 2), 0)
    c_h = jnp.clip(jnp.maximum(cy1 + h1 / 2, cy2 + h2 / 2)
                   - jnp.minimum(cy1 - h1 / 2, cy2 - h2 / 2), 0)
    inter_diag = (cx2 - cx1) ** 2 + (cy2 - cy1) ** 2
    c_diag = c_w ** 2 + c_h ** 2
    u = inter_diag / c_diag
    return iou, u, (w1, h1, w2, h2)


def ciou_loss(pred, target):
    """Complete-IoU loss, 1 - ciou per aligned pair (reference
    dino/util/box_loss.py ciou: aspect-ratio term gated by iou>0.5 with a
    stop-gradient alpha)."""
    iou, u, (w1, h1, w2, h2) = _iou_terms(pred, target)
    v = (4 / (np.pi ** 2)) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    s = jax.lax.stop_gradient((iou > 0.5).astype(iou.dtype))
    alpha = jax.lax.stop_gradient(s * v / (1 - iou + v))
    cious = jnp.clip(iou - u - alpha * v, -1.0, 1.0)
    return 1.0 - cious


def diou_loss(pred, target):
    """Distance-IoU loss, 1 - diou per aligned pair (reference
    dino/util/box_loss.py diou, clamp [-1, 1])."""
    iou, u, _ = _iou_terms(pred, target)
    dious = jnp.clip(iou - u, -1.0, 1.0)
    return 1.0 - dious
