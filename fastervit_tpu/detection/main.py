"""DINO detection training / evaluation CLI.

TPU-native analog of the reference entrypoint (dino/main.py:31-92 arg
parsing + SLConfig merge, 149-330 build/optimizer/epoch loop/COCO eval):
python-file configs with `_base_` inheritance and dotted CLI overrides,
the two-phase Hungarian training engine, per-module LR groups with the
reference's epoch LR drop, and the numpy COCO evaluator.

    python -m fastervit_tpu.detection.main \
        --config configs/dino/dino_4scale_faster_vit_4_21k_224.py \
        --coco-path /data/coco --output runs/dino
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("fastervit_tpu.detection")


def parse_args(argv=None):
    p = argparse.ArgumentParser("DINO detection (TPU)")
    p.add_argument("--config", required=True,
                   help="python config file (configs/dino/*.py)")
    p.add_argument("--options", nargs="*", default=[],
                   help="dotted config overrides, e.g. epochs=1 lr=2e-4")
    p.add_argument("--coco-path", default="",
                   help="COCO root (expects {train,val}2017 + annotations)")
    p.add_argument("--output", default="./output_dino")
    p.add_argument("--batch-size", type=int, default=0,
                   help="override config batch_size")
    p.add_argument("--image-size", type=int, default=512,
                   help="square training/eval canvas (squash resize)")
    p.add_argument("--epochs", type=int, default=0, help="override epochs")
    p.add_argument("--eval", action="store_true", help="evaluation only")
    p.add_argument("--checkpoint", default="",
                   help="reference DINO .pth checkpoint to convert and load")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic data smoke run (no COCO needed)")
    p.add_argument("--max-targets", type=int, default=20)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="model compute dtype (bfloat16 on TPU)")
    p.add_argument("--matcher", default="auto",
                   choices=["auto", "host", "auction"],
                   help="host = exact scipy Hungarian (reference semantics); "
                        "auction = on-device eps-optimal matching, one fully "
                        "jitted program per step (no host sync, 3.2x faster "
                        "on TPU); auto (default) = auction on TPU, host "
                        "elsewhere — the two converge to matching loss "
                        "(tests/test_matcher_device.py)")
    return p.parse_args(argv)


def _synthetic_batches(n_batches, batch_size, image_size, num_classes, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n_batches):
        imgs = rng.randn(batch_size, image_size, image_size, 3).astype(
            np.float32)
        targets = []
        for _ in range(batch_size):
            n = rng.randint(1, 6)
            boxes = np.stack([rng.uniform(0.2, 0.8, n),
                              rng.uniform(0.2, 0.8, n),
                              rng.uniform(0.05, 0.2, n),
                              rng.uniform(0.05, 0.2, n)], -1)
            targets.append({"boxes": boxes.astype(np.float32),
                            "labels": rng.randint(0, num_classes, n).astype(
                                np.int32),
                            "orig_size": np.asarray(
                                [image_size, image_size], np.int32)})
        yield imgs, targets


def run_eval(det, variables, batches, num_select=300):
    """COCO-protocol evaluation over (images, targets) batches (reference
    engine.py evaluate + PostProcess)."""
    from fastervit_tpu.detection.coco_eval import evaluate_detections
    from fastervit_tpu.detection.dino import postprocess
    from fastervit_tpu.ops.boxes import box_cxcywh_to_xyxy

    fwd = jax.jit(lambda v, x: det.apply(v, x))
    preds, gts = [], []
    for imgs, targets in batches:
        out = fwd(variables, jnp.asarray(imgs))
        sizes = np.stack([t["orig_size"] for t in targets])
        results = postprocess(out, jnp.asarray(sizes),
                              num_select=num_select)
        for bi, t in enumerate(targets):
            preds.append({k: np.asarray(v[bi]) for k, v in results.items()})
            h0, w0 = t["orig_size"]
            gxyxy = np.asarray(box_cxcywh_to_xyxy(
                jnp.asarray(t["boxes"]))) * np.asarray([w0, h0, w0, h0])
            gts.append({"boxes": gxyxy, "labels": t["labels"]})
    return evaluate_detections(preds, gts, full_breakdown=True)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    from fastervit_tpu.detection.coco_data import CocoDetectionDataset
    from fastervit_tpu.detection.dino import build_dino_from_config
    from fastervit_tpu.detection.engine import (create_detection_optimizer,
                                                train_detection_epoch)
    from fastervit_tpu.utils.pyconfig import PyConfig

    cfg = PyConfig.fromfile(args.config)
    for ov in args.options:
        k, v = ov.split("=", 1)
        try:
            v = json.loads(v)
        except ValueError:
            pass
        cfg.merge_from_dict({k: v})

    det = build_dino_from_config(cfg, dtype=getattr(jnp, args.dtype))
    batch_size = args.batch_size or int(cfg.get("batch_size", 2))
    epochs = args.epochs or int(cfg.get("epochs", 12))
    size = args.image_size

    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), x0)
    if args.checkpoint:
        import torch
        from fastervit_tpu.detection.convert import convert_dino_state_dict
        sd = torch.load(args.checkpoint, map_location="cpu",
                        weights_only=False)
        sd = sd.get("model", sd.get("state_dict", sd))
        variables = convert_dino_state_dict(sd, variables)
        log.info("loaded reference checkpoint %s", args.checkpoint)

    train_ds = None
    if not args.synthetic and not args.eval:
        train_ds = CocoDetectionDataset(
            os.path.join(args.coco_path, "train2017"),
            os.path.join(args.coco_path, "annotations",
                         "instances_train2017.json"),
            image_size=(size, size))

    def train_batches():
        if args.synthetic:
            yield from _synthetic_batches(4, batch_size, size,
                                          det.num_classes)
        else:
            yield from train_ds.batches(batch_size)

    def val_batches():
        if args.synthetic:
            yield from _synthetic_batches(2, batch_size, size,
                                          det.num_classes, seed=1)
        else:
            ds = CocoDetectionDataset(
                os.path.join(args.coco_path, "val2017"),
                os.path.join(args.coco_path, "annotations",
                             "instances_val2017.json"),
                image_size=(size, size))
            yield from ds.batches(batch_size)

    os.makedirs(args.output, exist_ok=True)
    if args.eval:
        stats = run_eval(det, variables, val_batches(),
                         num_select=int(cfg.get("num_select", 300)))
        log.info("eval: %s", stats)
        with open(os.path.join(args.output, "eval.json"), "w") as f:
            json.dump(stats, f)
        return stats

    # per-module LRs with the reference's step drop at lr_drop epochs
    # (dino/main.py:230-238; StepLR gamma 0.1)
    import optax
    # lr_drop is an EPOCH boundary (dino StepLR); convert to steps using
    # the real dataset length so the drop fires at epoch lr_drop, not at a
    # hardcoded step count
    steps_per_epoch = max(
        1, 4 if args.synthetic else len(train_ds) // batch_size)
    drop = int(cfg.get("lr_drop", 11)) * steps_per_epoch

    def sched(base):
        return optax.piecewise_constant_schedule(base, {drop: 0.1})

    tx = create_detection_optimizer(
        variables["params"], lr=sched(float(cfg.get("lr", 1e-4))),
        lr_backbone=sched(float(cfg.get("lr_backbone", 1e-5))),
        weight_decay=float(cfg.get("weight_decay", 1e-4)),
        clip_norm=float(cfg.get("clip_max_norm", 0.1)),
        lr_linear_proj_mult=float(cfg.get("lr_linear_proj_mult", 1.0)),
        linear_proj_names=tuple(cfg.get("lr_linear_proj_names", [])))
    opt_state = tx.init(variables["params"])

    best = -1.0
    step_cache: dict = {}   # jitted step programs persist across epochs
    for epoch in range(epochs):
        t0 = time.time()
        variables, opt_state, metrics = train_detection_epoch(
            det, variables, opt_state, tx, train_batches(),
            max_targets=args.max_targets, matcher=args.matcher,
            step_cache=step_cache)
        log.info("epoch %d: loss %.4f (%.0fs)", epoch, metrics["loss"],
                 time.time() - t0)
        stats = run_eval(det, variables, val_batches(),
                         num_select=int(cfg.get("num_select", 300)))
        log.info("epoch %d eval: %s", epoch, stats)
        if stats["mAP"] >= best:
            best = stats["mAP"]
            import pickle
            with open(os.path.join(args.output, "best.pkl"), "wb") as f:
                pickle.dump(jax.device_get(variables), f)
    return {"best_mAP": best}


if __name__ == "__main__":
    main()
