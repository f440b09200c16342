"""Detection training engine (reference dino/engine.py:20-120 train_one_epoch
/ evaluate, re-designed for jit).

The DETR criterion needs an exact Hungarian assignment (scipy, host-side),
which cannot live inside jit. The TPU-native structure is two-phase:

  1. jitted forward produces per-layer logits/boxes and the matching cost
     matrices (stop-gradient);
  2. the tiny LPs solve on host;
  3. a jitted loss+grad step consumes the assignments as index arrays.

Targets are padded to a static `max_targets` per image so every step
compiles once.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fastervit_tpu.detection.dino import sigmoid_focal_loss
from fastervit_tpu.ops.boxes import (box_cxcywh_to_xyxy, generalized_box_iou,
                                     hungarian_cost_matrix, hungarian_match)


def pad_targets(targets: List[Dict], max_targets: int) -> Dict[str, np.ndarray]:
    """Per-image dicts -> fixed-size arrays with a validity mask."""
    b = len(targets)
    labels = np.zeros((b, max_targets), np.int32)
    boxes = np.zeros((b, max_targets, 4), np.float32)
    mask = np.zeros((b, max_targets), bool)
    for i, t in enumerate(targets):
        n = min(len(t["labels"]), max_targets)
        labels[i, :n] = np.asarray(t["labels"])[:n]
        boxes[i, :n] = np.asarray(t["boxes"])[:n]
        mask[i, :n] = True
    return {"labels": labels, "boxes": boxes, "mask": mask}


def loss_layers(outputs) -> Tuple[List, List]:
    """Decoder layers + the encoder's top-k (interm) proposals as one extra
    matched layer (reference SetCriterion handles interm_outputs with the
    same Hungarian losses, dino.py:302-307 + engine loss_dict)."""
    logits = list(outputs["logits"])
    boxes = list(outputs["boxes"])
    if "interm_logits" in outputs:
        logits.append(outputs["interm_logits"])
        boxes.append(outputs["interm_boxes"])
    return logits, boxes


def compute_costs(outputs, tgt, num_layers: int):
    """Per-layer Hungarian cost matrices: list of L x (B, Q_l, T)."""
    logits_l, boxes_l = loss_layers(outputs)
    costs = []
    for li in range(num_layers):
        layer = []
        for bi in range(tgt["labels"].shape[0]):
            c = hungarian_cost_matrix(logits_l[li][bi],
                                      boxes_l[li][bi],
                                      tgt["labels"][bi], tgt["boxes"][bi])
            # invalid targets get prohibitive cost so they never match
            c = jnp.where(tgt["mask"][bi][None, :], c, 1e6)
            layer.append(c)
        costs.append(jnp.stack(layer))
    return costs


def make_cost_fn(num_layers: int):
    @jax.jit
    def cost_fn(outputs, tgt):
        return compute_costs(outputs, tgt, num_layers)
    return cost_fn


def solve_assignments(costs, tgt_mask: np.ndarray) -> np.ndarray:
    """list of (B, Q_l, T) costs -> (L, B, T) query index per target
    (-1 invalid). Q may differ per layer (interm layer vs dn-augmented
    decoder layers)."""
    l = len(costs)
    b, _, t = np.asarray(costs[0]).shape
    out = np.full((l, b, t), -1, np.int32)
    for li in range(l):
        ci = np.asarray(costs[li])
        for bi in range(b):
            n = int(tgt_mask[bi].sum())
            if n == 0:
                continue
            rows, cols = hungarian_match(ci[bi][:, :n])
            for r, c in zip(rows, cols):
                out[li, bi, c] = r
    return out


def detection_loss(outputs, tgt, assignment, num_classes: int,
                   weight_class: float = 1.0, weight_bbox: float = 5.0,
                   weight_giou: float = 2.0):
    """Jit-friendly criterion given assignments (L, B, T); L covers the
    decoder layers plus the encoder interm layer (see loss_layers)."""
    logits_l, boxes_l = loss_layers(outputs)
    num_layers = len(logits_l)
    num_boxes = jnp.maximum(tgt["mask"].sum(), 1)
    total_ce = 0.0
    total_bbox = 0.0
    total_giou = 0.0
    for li in range(num_layers):
        logits = logits_l[li]                   # (B, Q, K)
        boxes = boxes_l[li]
        b, q, k = logits.shape
        idx = jnp.clip(assignment[li], 0, q - 1)          # (B, T)
        valid = (assignment[li] >= 0) & tgt["mask"]
        onehot = jnp.zeros((b, q, k))
        scat = jax.nn.one_hot(tgt["labels"], k) * valid[..., None]
        onehot = jnp.zeros((b, q, k)).at[
            jnp.arange(b)[:, None], idx].add(scat)
        total_ce += sigmoid_focal_loss(logits, onehot).sum() / num_boxes
        pb = jnp.take_along_axis(boxes, idx[..., None], axis=1)  # (B, T, 4)
        l1 = jnp.abs(pb - tgt["boxes"]).sum(-1)
        total_bbox += jnp.where(valid, l1, 0.0).sum() / num_boxes
        giou = jax.vmap(lambda a, c: jnp.diagonal(
            generalized_box_iou(box_cxcywh_to_xyxy(a),
                                box_cxcywh_to_xyxy(c))))(pb, tgt["boxes"])
        total_giou += jnp.where(valid, 1 - giou, 0.0).sum() / num_boxes
    loss = (weight_class * total_ce + weight_bbox * total_bbox
            + weight_giou * total_giou)
    return loss, {"loss_ce": total_ce, "loss_bbox": total_bbox,
                  "loss_giou": total_giou}


def detection_param_labels(params, backbone_key: str = "backbone",
                           linear_proj_names: tuple = ()):
    """Label each param 'backbone' / 'linear_proj' / 'main' by its path —
    the reference's per-module LR grouping (dino/util/get_param_dicts.py:
    22-51: default type puts any 'backbone' param on lr_backbone;
    ddetr_in_mmdet additionally scales sampling-offset/reference-point
    projections)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        joined = "/".join(str(p) for p in path)
        if backbone_key in joined:
            labels[path] = "backbone"
        elif any(k in joined for k in linear_proj_names):
            labels[path] = "linear_proj"
        else:
            labels[path] = "main"
    return flax.traverse_util.unflatten_dict(labels)


def create_detection_optimizer(params, lr: float = 1e-4,
                               lr_backbone: float = 1e-5,
                               weight_decay: float = 1e-4,
                               clip_norm: float = 0.1,
                               lr_linear_proj_mult: float = 1.0,
                               linear_proj_names: tuple = ()):
    """AdamW with per-group LRs and grad clipping (reference dino/main.py:
    230-238: clip_max_norm 0.1, AdamW wd 1e-4, lr 1e-4 / backbone 1e-5)."""
    def adamw(lr_):
        return optax.adamw(lr_, weight_decay=weight_decay)

    if callable(lr):
        lr_proj = lambda step: lr(step) * lr_linear_proj_mult
    else:
        lr_proj = lr * lr_linear_proj_mult
    labels = detection_param_labels(params,
                                    linear_proj_names=linear_proj_names)
    tx = optax.multi_transform(
        {"main": adamw(lr), "backbone": adamw(lr_backbone),
         "linear_proj": adamw(lr_proj)}, labels)
    return optax.chain(optax.clip_by_global_norm(clip_norm), tx)


def make_detection_train_step(detector, tx, ema_decay: float = 0.0):
    """The jitted phase-3 step. BatchNorm runs on frozen (eval) statistics —
    the standard frozen-BN detection-backbone setup (reference uses
    FrozenBatchNorm2d, dino/models/dino/backbone.py:36). With ema_decay > 0
    an EMA parameter tree is threaded through (reference dino ModelEma,
    util/utils.py + engine.py ema update)."""

    def train_step(params, batch_stats, opt_state, batch_images, tgt,
                   assignment, ema_params=None):
        def loss_fn(p):
            out = detector.apply({"params": p, "batch_stats": batch_stats},
                                 batch_images, training=False)
            loss, parts = detection_loss(out, tgt, assignment,
                                         detector.num_classes)
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay > 0.0 and ema_params is not None:
            from fastervit_tpu.train.ema import ema_update
            ema_params = ema_update(ema_params, params, ema_decay)
        return params, opt_state, {"loss": loss, **parts}, ema_params

    return jax.jit(train_step)


def make_fused_detection_train_step(detector, tx, num_layers: int,
                                    ema_decay: float = 0.0,
                                    eps: float = 1e-3):
    """Fully-on-device step: forward -> costs -> auction match -> loss ->
    grad -> update in ONE jitted program. Removes the two-phase engine's
    per-step device->host sync + second forward (the reference pays the same
    host scipy round trip, dino/models/dino/matcher.py:80-104 — this is a
    TPU-side improvement, not a parity requirement). Matching quality: within
    num_targets*eps of the Hungarian optimum (see matcher_device).

    num_layers: matched layer count = len(loss_layers(outputs)[0]) (decoder
    layers + the interm layer when two-stage)."""
    from fastervit_tpu.detection.matcher_device import solve_assignments_device

    def train_step(params, batch_stats, opt_state, batch_images, tgt,
                   ema_params=None):
        def loss_fn(p):
            out = detector.apply({"params": p, "batch_stats": batch_stats},
                                 batch_images, training=False)
            costs = compute_costs(jax.lax.stop_gradient(out), tgt, num_layers)
            assignment = solve_assignments_device(costs, tgt["mask"], eps)
            loss, parts = detection_loss(out, tgt, assignment,
                                         detector.num_classes)
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay > 0.0 and ema_params is not None:
            from fastervit_tpu.train.ema import ema_update
            ema_params = ema_update(ema_params, params, ema_decay)
        return params, opt_state, {"loss": loss, **parts}, ema_params

    return jax.jit(train_step)


def train_detection_epoch(detector, variables, opt_state, tx, loader,
                          max_targets: int = 20, ema_decay: float = 0.0,
                          ema_params=None, matcher: str = "auto",
                          step_cache: Optional[dict] = None):
    """One epoch over (images, targets) batches (reference engine.py:20-120).
    variables = {'params', 'batch_stats'}; returns updated variables. With
    ema_decay > 0, 'ema_params' rides along in the returned variables.
    matcher: 'host' = two-phase exact Hungarian (reference semantics);
    'auction' = fully-jitted on-device eps-optimal matching (one forward and
    no per-step host sync, 3.2x faster per step on TPU); 'auto' = auction on
    TPU, host elsewhere (the default since the two were shown to converge to
    matching loss — tests/test_matcher_device.py
    test_auction_and_hungarian_converge_alike). step_cache: pass the same
    dict across epochs so the jitted step programs (minutes-long compiles at
    640px through the device relay) are built once per run, not once per
    epoch."""
    if matcher == "auto":
        matcher = "auction" if jax.default_backend() == "tpu" else "host"
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if ema_decay > 0.0 and ema_params is None:
        ema_params = variables.get("ema_params") or \
            jax.tree.map(jnp.copy, params)
    cache = step_cache if step_cache is not None else {}
    if "fwd" not in cache:
        cache["fwd"] = jax.jit(lambda p, bs, x: detector.apply(
            {"params": p, "batch_stats": bs}, x, training=False))
    fwd = cache["fwd"]
    losses = []
    for images, targets in loader:
        images = jnp.asarray(images)
        tgt = jax.tree.map(jnp.asarray, pad_targets(targets, max_targets))
        if matcher == "auction":
            if "fused_step" not in cache:
                # layer count is static: derive it from abstract shapes
                # (jax.eval_shape — no compile, no device execution)
                out_sh = jax.eval_shape(
                    lambda p, bs, x: detector.apply(
                        {"params": p, "batch_stats": bs}, x, training=False),
                    params, batch_stats, images)
                cache["fused_step"] = make_fused_detection_train_step(
                    detector, tx, len(loss_layers(out_sh)[0]), ema_decay)
            params, opt_state, metrics, ema_params = cache["fused_step"](
                params, batch_stats, opt_state, images, tgt, ema_params)
            losses.append(metrics["loss"])  # device scalar; fetch at end
            continue
        out = fwd(params, batch_stats, images)
        if "cost_fn" not in cache:
            cache["cost_fn"] = make_cost_fn(len(loss_layers(out)[0]))
            cache["step"] = make_detection_train_step(detector, tx, ema_decay)
        costs = cache["cost_fn"](jax.lax.stop_gradient(out), tgt)
        assignment = jnp.asarray(solve_assignments(costs,
                                                   np.asarray(tgt["mask"])))
        params, opt_state, metrics, ema_params = cache["step"](
            params, batch_stats, opt_state, images, tgt, assignment,
            ema_params)
        losses.append(float(metrics["loss"]))
    losses = [float(l) for l in losses]
    new_vars = {"params": params, "batch_stats": batch_stats}
    if ema_params is not None:
        new_vars["ema_params"] = ema_params
    return (new_vars, opt_state, {"loss": float(np.mean(losses))})
