"""Minimal COCO-style mAP evaluator (numpy; no pycocotools dependency).

Implements the COCO protocol's core: per-class greedy score-ordered matching
at IoU thresholds .50:.05:.95, 101-point interpolated AP, averaged over
classes and thresholds (the reference reports box AP via pycocotools,
dino/datasets/coco_eval.py). Area-range/maxDet breakdowns beyond maxDet=100
are out of scope for now.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """xyxy IoU: a (N,4), b (M,4) -> (N,M)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def _ap_from_matches(scores, matched, n_gt) -> float:
    """101-point interpolated AP from score-ordered TP flags."""
    if n_gt == 0:
        return np.nan
    order = np.argsort(-scores, kind="stable")
    tp = matched[order].astype(float)
    fp = 1.0 - tp
    ctp, cfp = np.cumsum(tp), np.cumsum(fp)
    recall = ctp / n_gt
    precision = ctp / np.maximum(ctp + cfp, 1e-9)
    # precision envelope (monotone non-increasing from the right)
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(
        idx, max(len(precision) - 1, 0))], 0.0)
    return float(prec_at.mean())


def evaluate_detections(predictions: List[Dict], ground_truths: List[Dict],
                        max_dets: int = 100) -> Dict[str, float]:
    """predictions/ground_truths: per-image dicts of numpy arrays
    {'boxes' (N,4) xyxy, 'labels' (N,), 'scores' (N,) [preds only]}.
    Returns {'mAP', 'AP50', 'AP75'}."""
    classes = sorted({int(c) for gt in ground_truths
                      for c in np.asarray(gt["labels"]).tolist()})
    ap = np.full((len(classes), len(IOU_THRESHOLDS)), np.nan)
    for ci, cls in enumerate(classes):
        all_scores, all_matched = [], {ti: [] for ti in range(len(IOU_THRESHOLDS))}
        n_gt = 0
        for pred, gt in zip(predictions, ground_truths):
            g_mask = np.asarray(gt["labels"]) == cls
            g_boxes = np.asarray(gt["boxes"], float)[g_mask]
            n_gt += len(g_boxes)
            p_mask = np.asarray(pred["labels"]) == cls
            p_boxes = np.asarray(pred["boxes"], float)[p_mask]
            p_scores = np.asarray(pred["scores"], float)[p_mask]
            order = np.argsort(-p_scores, kind="stable")[:max_dets]
            p_boxes, p_scores = p_boxes[order], p_scores[order]
            all_scores.append(p_scores)
            iou = _iou_matrix(p_boxes, g_boxes) if len(p_boxes) and len(g_boxes) \
                else np.zeros((len(p_boxes), len(g_boxes)))
            for ti, thr in enumerate(IOU_THRESHOLDS):
                taken = np.zeros(len(g_boxes), bool)
                flags = np.zeros(len(p_boxes), bool)
                for di in range(len(p_boxes)):   # score-ordered greedy match
                    cand = np.where(~taken & (iou[di] >= thr))[0]
                    if len(cand):
                        best = cand[np.argmax(iou[di][cand])]
                        taken[best] = True
                        flags[di] = True
                all_matched[ti].append(flags)
        scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
        for ti in range(len(IOU_THRESHOLDS)):
            matched = (np.concatenate(all_matched[ti]) if all_matched[ti]
                       else np.zeros(0, bool))
            ap[ci, ti] = _ap_from_matches(scores, matched, n_gt)
    return {"mAP": float(np.nanmean(ap)),
            "AP50": float(np.nanmean(ap[:, 0])),
            "AP75": float(np.nanmean(ap[:, 5]))}
