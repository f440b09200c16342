"""MOTR tracking training CLI.

TPU-native analog of the reference entrypoint (motrv2/main.py:33-47 args +
epoch loop, tools/ddp_train.sh). Flag files work the reference way via
argparse @-expansion: `python -m fastervit_tpu.tracking.main @configs/my.args`
(the reference expands configs/motrv2.args through the shell).

Clip-based training (engine.py train_one_epoch_mot): the DanceTrack clip
sampler with progressive lengths feeds the clip-consistent matcher; MOTRv2
proposal queries come from a det_db json.
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

log = logging.getLogger("fastervit_tpu.tracking")


def parse_args(argv=None):
    p = argparse.ArgumentParser("MOTR tracking (TPU)",
                                fromfile_prefix_chars="@")
    p.add_argument("--backbone", default="faster_vit_0_any_res")
    p.add_argument("--mot-path", default="", help="DanceTrack/MOT root")
    p.add_argument("--det-db", default="", help="det_db json (MOTRv2 proposals)")
    p.add_argument("--output", default="./output_motr")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lr-backbone", type=float, default=2e-5)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--clip-max-norm", type=float, default=0.1)
    p.add_argument("--img-height", type=int, default=800)
    p.add_argument("--img-width", type=int, default=1536)
    p.add_argument("--sample-interval", type=int, default=10)
    p.add_argument("--sampler-steps", type=int, nargs="*", default=[])
    p.add_argument("--sampler-lengths", type=int, nargs="*", default=[5])
    p.add_argument("--num-queries", type=int, default=60)
    p.add_argument("--num-proposals", type=int, default=10)
    p.add_argument("--enc-layers", type=int, default=3)
    p.add_argument("--dec-layers", type=int, default=3)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--clips-per-epoch", type=int, default=100)
    p.add_argument("--joint-static-txt", default="",
                   help="CrowdHuman-style data_txt of static images: enables "
                        "joint multi-dataset training (reference "
                        "datasets/joint.py)")
    p.add_argument("--joint-static-root", default="",
                   help="root the data_txt paths are relative to")
    p.add_argument("--shift-padding", type=int, default=50,
                   help="static pseudo-clip shift jitter in px")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic clips smoke run")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def _synthetic_clips(n, clip_len, h, w, num_proposals, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        frames = rng.randn(clip_len, 1, h, w, 3).astype(np.float32)
        targets, props = [], []
        for f in range(clip_len):
            boxes = np.asarray([[0.4 + 0.01 * f, 0.4, 0.1, 0.2]], np.float32)
            targets.append([{"boxes": boxes,
                             "labels": np.zeros(1, np.int32),
                             "track_ids": np.asarray([7])}])
            props.append(np.concatenate(
                [np.tile(boxes, (num_proposals, 1)),
                 rng.rand(num_proposals, 1).astype(np.float32)],
                -1)[None])
        yield frames, targets, np.stack(props)


def _dance_clips(sampler, args, rng):
    """Materialize (frames, targets, proposals) clips from the sampler."""
    from PIL import Image

    order = rng.permutation(len(sampler.indices))[:args.clips_per_epoch]
    for i in order:
        vid, t0 = sampler.indices[int(i)]
        ts = sampler.sample_frame_indices(vid, t0, rng)
        frames, targets, props = [], [], []
        for t in ts:
            img = Image.open(sampler.frame_image_path(vid, t)).convert("RGB")
            w0, h0 = img.size
            img = img.resize((args.img_width, args.img_height), 3)
            x = np.asarray(img, np.float32) / 255.0
            x = (x - np.asarray([0.485, 0.456, 0.406], np.float32)) \
                / np.asarray([0.229, 0.224, 0.225], np.float32)
            frames.append(x[None])
            targets.append([sampler.frame_targets(vid, t, (w0, h0))])
            props.append(sampler.frame_proposals(vid, t, (w0, h0))[None])
        yield np.stack(frames), targets, np.stack(props)


def _joint_clips(sampler, args, rng):
    """Normalized clips from a JointClips sampler (mixed video + static
    pseudo-clip sources)."""
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    n = 0
    for frames, targets, props in sampler.clip_batches(
            1, rng, (args.img_height, args.img_width), with_proposals=True):
        yield (frames - mean) / std, targets, props
        n += 1
        if n >= args.clips_per_epoch:
            return


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    import optax
    from fastervit_tpu.models.registry import get_config
    from fastervit_tpu.tracking.motr import (MOTRDetector,
                                             motr_clip_train_epoch)

    cfg = get_config(args.backbone,
                     resolution=[args.img_height, args.img_width])
    det = MOTRDetector(backbone_cfg=cfg, num_classes=1, dim=args.dim,
                       num_detect_queries=args.num_queries,
                       num_track_queries=args.num_queries,
                       num_proposal_queries=args.num_proposals,
                       enc_layers=args.enc_layers,
                       dec_layers=args.dec_layers)
    x0 = jnp.zeros((1, args.img_height, args.img_width, 3), jnp.float32)
    variables = jax.jit(det.init)(jax.random.PRNGKey(args.seed), x0)
    tx = optax.chain(optax.clip_by_global_norm(args.clip_max_norm),
                     optax.adamw(args.lr, weight_decay=args.weight_decay))
    opt_state = tx.init(variables["params"])

    sampler = None
    if not args.synthetic:
        from fastervit_tpu.tracking.dance_data import DanceTrackClips
        sources = []
        if args.mot_path:
            sources.append(DanceTrackClips(
                args.mot_path, sample_interval=args.sample_interval,
                sampler_steps=args.sampler_steps,
                sampler_lengths=args.sampler_lengths,
                det_db=args.det_db or None,
                num_proposals=args.num_proposals))
        if args.joint_static_txt:
            from fastervit_tpu.tracking.joint_data import (JointClips,
                                                           StaticImageClips)
            sources.append(StaticImageClips(
                args.joint_static_txt, args.joint_static_root,
                shift_padding=args.shift_padding,
                num_proposals=args.num_proposals,
                video_offset=10_000))
            sampler = JointClips(sources,
                                 sampler_steps=args.sampler_steps,
                                 sampler_lengths=args.sampler_lengths)
        else:
            sampler = sources[0]

    os.makedirs(args.output, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    for epoch in range(args.epochs):
        t0 = time.time()
        if sampler is not None:
            sampler.set_epoch(epoch)
            if args.joint_static_txt:
                clips = _joint_clips(sampler, args, rng)
            else:
                clips = _dance_clips(sampler, args, rng)
        else:
            clips = _synthetic_clips(2, max(args.sampler_lengths),
                                     args.img_height, args.img_width,
                                     args.num_proposals, seed=epoch)
        variables, opt_state, metrics = motr_clip_train_epoch(
            det, variables, opt_state, tx, clips)
        log.info("epoch %d: loss %.4f (%.0fs)", epoch, metrics["loss"],
                 time.time() - t0)
        with open(os.path.join(args.output, "checkpoint.pkl"), "wb") as f:
            pickle.dump(jax.device_get(variables), f)
    return metrics


if __name__ == "__main__":
    main()
