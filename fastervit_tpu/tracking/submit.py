"""MOTR streaming tracking inference CLI (reference submit_dance.py:29-121:
ListImgDataset + proposal db + Detector.detect per-frame loop writing MOT
result files).

    python -m fastervit_tpu.tracking.submit --mot-path /data/DanceTrack \
        --split val --checkpoint runs/motr/checkpoint.pkl --output results/

--exact (or --reference-checkpoint ckpt.pth) routes through the
checkpoint-exact assembly (tracking/motr_exact.py): converted reference
MOTR weights stream with the reference's per-frame semantics.
"""
from __future__ import annotations

import argparse
import logging
import os
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("fastervit_tpu.tracking.submit")


def parse_args(argv=None):
    p = argparse.ArgumentParser("MOTR submit (TPU)", fromfile_prefix_chars="@")
    p.add_argument("--mot-path", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--checkpoint", default="",
                   help="pickle from tracking.main (random init if empty)")
    p.add_argument("--det-db", default="")
    p.add_argument("--output", default="./tracker_results")
    p.add_argument("--backbone", default="faster_vit_0_any_res")
    p.add_argument("--img-height", type=int, default=800)
    p.add_argument("--img-width", type=int, default=1536)
    p.add_argument("--num-queries", type=int, default=60)
    p.add_argument("--num-proposals", type=int, default=10)
    p.add_argument("--enc-layers", type=int, default=3)
    p.add_argument("--dec-layers", type=int, default=3)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--score-thresh", type=float, default=0.5)
    p.add_argument("--miss-tolerance", type=int, default=20)
    p.add_argument("--max-frames", type=int, default=0,
                   help="cap frames per sequence (0 = all)")
    p.add_argument("--exact", action="store_true",
                   help="checkpoint-exact MOTR path (tracking/motr_exact)")
    p.add_argument("--reference-checkpoint", default="",
                   help="reference MOTR .pth to convert (implies --exact)")
    p.add_argument("--track-capacity", type=int, default=50)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="model compute dtype; bfloat16 halves HBM traffic "
                        "for the backbone/transformer matmuls on TPU")
    p.add_argument("--lite-encoder", action="store_true",
                   help="speed mode: exclude the stride-4 level from the "
                        "encoder query set (kept as values) — ~4x lower "
                        "MSDA gather cost, NOT reference-exact "
                        "(docs/perf_downstream.md)")
    return p.parse_args(argv)


def _load_sequences(args):
    """Yield (seq, frames, proposals, orig_sizes) per sequence dir."""
    import json

    from PIL import Image

    det_db = {}
    if args.det_db:
        with open(os.path.join(args.mot_path, args.det_db)) as f:
            det_db = json.load(f)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    split_dir = os.path.join(args.mot_path, args.split)
    for seq in sorted(os.listdir(split_dir)):
        img_dir = os.path.join(split_dir, seq, "img1")
        if not os.path.isdir(img_dir):
            continue
        names = sorted(n for n in os.listdir(img_dir)
                       if n.lower().endswith((".jpg", ".jpeg", ".png")))
        if args.max_frames:
            names = names[:args.max_frames]
        frames, props, sizes = [], [], []
        for n in names:
            img = Image.open(os.path.join(img_dir, n)).convert("RGB")
            w0, h0 = img.size
            sizes.append((w0, h0))
            x = np.asarray(img.resize((args.img_width, args.img_height), 3),
                           np.float32) / 255.0
            frames.append((x - mean) / std)
            key = os.path.join(args.split, seq, "img1",
                               os.path.splitext(n)[0] + ".txt")
            prop = np.tile(np.asarray([0.5, 0.5, 0.1, 0.1, 0.0], np.float32),
                           (args.num_proposals, 1))
            rows = []
            for line in det_db.get(key, []):
                x0, y0, bw, bh, s = map(float, line.split(","))
                rows.append([(x0 + bw / 2) / w0, (y0 + bh / 2) / h0,
                             bw / w0, bh / h0, s])
            rows.sort(key=lambda r: -r[4])
            for i, r in enumerate(rows[:args.num_proposals]):
                prop[i] = r
            props.append(prop)
        yield seq, frames, props, sizes


def _run_exact(args, sequences):
    """Streaming via the checkpoint-exact assembly (MOTRDetectorExact +
    QIMv2 + reference RuntimeTrackerBase semantics)."""
    from fastervit_tpu.models.registry import get_config
    from fastervit_tpu.tracking.mot_data import write_mot_file
    from fastervit_tpu.tracking.motr_exact import (MOTRDetectorExact, QIMv2,
                                                   exact_inference_sequence)

    cfg = get_config(args.backbone,
                     resolution=[args.img_height, args.img_width])
    det = MOTRDetectorExact(backbone_cfg=cfg, num_classes=1, dim=args.dim,
                            num_queries=args.num_queries,
                            enc_layers=args.enc_layers,
                            dec_layers=args.dec_layers,
                            dtype=getattr(jnp, args.dtype),
                            lite_encoder=args.lite_encoder)
    qim = QIMv2(dim=args.dim)
    total = args.num_queries + args.num_proposals + args.track_capacity
    x0 = jnp.zeros((1, args.img_height, args.img_width, 3), jnp.float32)
    qp0 = jnp.zeros((1, total, args.dim))
    rp0 = jnp.full((1, total, 4), 0.5)
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), x0, qp0, rp0)
    vq = qim.init(jax.random.PRNGKey(1), qp0, qp0, rp0,
                  jnp.zeros((1, total)), jnp.ones((1, total), bool))
    if args.reference_checkpoint:
        import torch
        from fastervit_tpu.tracking.convert import convert_motr_checkpoint
        sd = torch.load(args.reference_checkpoint, map_location="cpu",
                        weights_only=False)
        sd = sd.get("model", sd.get("state_dict", sd))
        # convert the FULL variables dict: backbone BatchNorm running
        # stats live in batch_stats, not params (motr checkpoint keys
        # backbone.0.*.running_{mean,var})
        merged = {"params": dict(variables["params"], qim=vq["params"])}
        for coll, tree in variables.items():
            if coll != "params":
                merged[coll] = tree
        merged = convert_motr_checkpoint(sd, merged)
        vq = {"params": merged["params"].pop("qim")}
        variables = {**merged}
        log.info("converted reference checkpoint %s",
                 args.reference_checkpoint)

    apply_fn = jax.jit(lambda vv, img, qp, rp, m: det.apply(
        vv, img, qp, rp, m))
    qim_fn = jax.jit(lambda oe, qf, rp, s, am: qim.apply(
        vq, oe, qf, rp, s, am))
    for seq, frames, props, sizes in sequences:
        t0 = time.time()
        results = exact_inference_sequence(
            apply_fn, qim_fn, variables, frames,
            num_queries=args.num_queries, dim=args.dim,
            proposals_per_frame=props, num_proposals=args.num_proposals,
            track_capacity=args.track_capacity,
            score_thresh=args.score_thresh,
            miss_tolerance=args.miss_tolerance)
        for res, (w0, h0) in zip(results, sizes):
            res["boxes"] = res["boxes"] * np.asarray([w0, h0, w0, h0])
            # reference area filter (submit_dance.py:115-118): drop boxes
            # with area <= 100 px in original-image coordinates
            wh = res["boxes"][:, 2:4] - res["boxes"][:, 0:2]
            keep = (wh[:, 0] * wh[:, 1]) > 100.0
            for k in ("ids", "boxes", "scores"):
                res[k] = res[k][keep]
        write_mot_file(os.path.join(args.output, f"{seq}.txt"), results)
        log.info("%s (exact): %d frames in %.0fs", seq, len(frames),
                 time.time() - t0)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    os.makedirs(args.output, exist_ok=True)
    if args.exact or args.reference_checkpoint:
        return _run_exact(args, _load_sequences(args))
    if args.lite_encoder:
        raise SystemExit("--lite-encoder is wired for the --exact streaming "
                         "path (the latency-critical one)")

    from fastervit_tpu.models.registry import get_config
    from fastervit_tpu.tracking.mot_data import write_mot_file
    from fastervit_tpu.tracking.motr import (MOTRDetector,
                                             motr_inference_sequence)

    cfg = get_config(args.backbone,
                     resolution=[args.img_height, args.img_width])
    det = MOTRDetector(backbone_cfg=cfg, num_classes=1, dim=args.dim,
                       num_detect_queries=args.num_queries,
                       num_track_queries=args.num_queries,
                       num_proposal_queries=args.num_proposals,
                       enc_layers=args.enc_layers,
                       dec_layers=args.dec_layers,
                       dtype=getattr(jnp, args.dtype))
    if args.checkpoint:
        with open(args.checkpoint, "rb") as f:
            variables = pickle.load(f)
    else:
        variables = jax.jit(det.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.img_height, args.img_width, 3), jnp.float32))

    apply = jax.jit(lambda v, img, te, tb, pr: det.apply(
        v, img, track_embed=te, track_boxes=tb, proposals=pr))

    def apply_fn(v, image, track_embed, track_boxes, proposals=None):
        if proposals is None:
            proposals = np.tile(
                np.asarray([0.5, 0.5, 0.1, 0.1, 0.0], np.float32),
                (image.shape[0], args.num_proposals, 1))
        return apply(v, jnp.asarray(image), jnp.asarray(track_embed),
                     jnp.asarray(track_boxes), jnp.asarray(proposals))

    for seq, frames, props, sizes in _load_sequences(args):
        t0 = time.time()
        results = motr_inference_sequence(
            apply_fn, variables, frames, num_track_slots=args.num_queries,
            dim=args.dim, score_thresh=args.score_thresh,
            filter_thresh=args.score_thresh,
            miss_tolerance=args.miss_tolerance,
            proposals_per_frame=props)
        # boxes are normalized cxcywh -> absolute xyxy per original size
        for res, (w0, h0) in zip(results, sizes):
            res["boxes"] = res["boxes"] * np.asarray([w0, h0, w0, h0])
            # reference area filter (submit_dance.py:115-118): drop boxes
            # with area <= 100 px in original-image coordinates
            wh = res["boxes"][:, 2:4] - res["boxes"][:, 0:2]
            keep = (wh[:, 0] * wh[:, 1]) > 100.0
            for k in ("ids", "boxes", "scores"):
                res[k] = res[k][keep]
        write_mot_file(os.path.join(args.output, f"{seq}.txt"), results)
        log.info("%s: %d frames in %.0fs", seq, len(frames),
                 time.time() - t0)


if __name__ == "__main__":
    main()
