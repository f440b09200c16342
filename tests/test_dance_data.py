"""DanceTrack clip sampler (reference motrv2/datasets/dance.py semantics)
+ MOTRv2 proposal-query integration."""
import json
import os

import numpy as np
import pytest

from fastervit_tpu.tracking.dance_data import DanceTrackClips


def _make_seq(root, split, name, num_frames, num_objs=2, size=(64, 48)):
    """Synthetic MOT-layout sequence: moving boxes + jpg frames."""
    from PIL import Image

    seq = os.path.join(root, split, name)
    os.makedirs(os.path.join(seq, "gt"), exist_ok=True)
    os.makedirs(os.path.join(seq, "img1"), exist_ok=True)
    w, h = size
    rows = []
    for t in range(1, num_frames + 1):
        arr = np.zeros((h, w, 3), np.uint8)
        for i in range(num_objs):
            x = 2 + 3 * t + 10 * i
            y = 4 + 2 * t + 6 * i
            rows.append(f"{t},{i + 1},{x},{y},8,10,1,1,1")
            arr[y:y + 10, x:x + 8] = 255
        # a marked-out row and a non-person row must be filtered
        rows.append(f"{t},99,0,0,5,5,0,1,1")
        rows.append(f"{t},98,0,0,5,5,1,4,1")
        Image.fromarray(arr).save(os.path.join(seq, "img1", f"{t:08d}.jpg"))
    with open(os.path.join(seq, "gt", "gt.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")


@pytest.fixture()
def dance_root(tmp_path):
    root = str(tmp_path / "DanceTrack")
    _make_seq(root, "train", "seq0", num_frames=12)
    _make_seq(root, "train", "seq1", num_frames=9)
    # proposal db for seq0 frame 1
    det_db = {os.path.join("train/seq0", "img1", "00000001.txt"):
              ["5,6,8,10,0.9", "20,10,8,10,0.4"]}
    with open(os.path.join(root, "det_db.json"), "w") as f:
        json.dump(det_db, f)
    return root


def test_indices_and_filtering(dance_root):
    ds = DanceTrackClips(dance_root, clip_len=4, sample_interval=3,
                         det_db="det_db.json")
    # (12 - 4) + (9 - 4) clip starts, from frame 1
    assert len(ds) == 8 + 5
    tgt = ds.frame_targets("train/seq0", 1, (64, 48))
    assert len(tgt["labels"]) == 2                 # filtered rows dropped
    assert (tgt["labels"] == 0).all()
    # id offsets: seq1 ids live in the second 100000 block
    t1 = ds.frame_targets("train/seq1", 1, (64, 48))
    assert t1["track_ids"].min() >= 100000
    # normalized cxcywh in [0,1]
    assert (tgt["boxes"] >= 0).all() and (tgt["boxes"] <= 1).all()


def test_interval_clamping_and_progressive_lengths(dance_root):
    ds = DanceTrackClips(dance_root, clip_len=5, sample_interval=10,
                         sampler_steps=[2, 4], sampler_lengths=[2, 3, 5])
    assert ds.num_frames_per_batch == 2
    ds.set_epoch(3)
    assert ds.num_frames_per_batch == 3
    ds.set_epoch(4)
    assert ds.num_frames_per_batch == 5
    rng = np.random.RandomState(0)
    ids = ds.sample_frame_indices("train/seq0", 5, rng)
    assert len(ids) == 5
    assert max(ids) <= ds.vid_tmax["train/seq0"]   # clamped to sequence end
    assert ids == sorted(ids)


def test_proposals_padded_and_sorted(dance_root):
    ds = DanceTrackClips(dance_root, det_db="det_db.json", num_proposals=4)
    p = ds.frame_proposals("train/seq0", 1, (64, 48))
    assert p.shape == (4, 5)
    assert p[0, 4] == pytest.approx(0.9) and p[1, 4] == pytest.approx(0.4)
    assert (p[2:, 4] == 0).all()                   # zero-score padding
    # empty frame -> all padding
    p2 = ds.frame_proposals("train/seq0", 2, (64, 48))
    assert (p2[:, 4] == 0).all()


def test_clip_batches_shapes(dance_root):
    ds = DanceTrackClips(dance_root, clip_len=3, sample_interval=2,
                         det_db="det_db.json", num_proposals=4)
    rng = np.random.RandomState(0)
    frames, targets, props = next(ds.clip_batches(
        2, rng, image_size=(32, 40), with_proposals=True))
    assert frames.shape == (3, 2, 32, 40, 3)
    assert props.shape == (3, 2, 4, 5)
    assert len(targets) == 3 and len(targets[0]) == 2
    assert frames.max() <= 1.0


def test_motrv2_proposal_clip_training_runs(dance_root, cpu_devices):
    """End-to-end: dance clips with proposals through the MOTRv2-style
    proposal-query detector; one epoch must run and the loss be finite."""
    import jax
    import jax.numpy as jnp
    import optax

    import fastervit_tpu as fvt
    from fastervit_tpu.tracking.motr import (MOTRDetector,
                                             motr_clip_train_epoch)

    cfg = fvt.get_config("faster_vit_0_224", depths=[1, 1, 1, 1],
                         num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
                         resolution=64)
    det = MOTRDetector(backbone_cfg=cfg, num_classes=1, dim=64,
                       num_detect_queries=8, num_track_queries=6,
                       num_proposal_queries=4, enc_layers=1, dec_layers=1)
    ds = DanceTrackClips(dance_root, clip_len=2, sample_interval=1,
                         det_db="det_db.json", num_proposals=4)
    rng = np.random.RandomState(0)
    clips = list(ds.clip_batches(1, rng, image_size=(64, 64),
                                 with_proposals=True))[:1]
    variables = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         proposals=jnp.zeros((1, 4, 5)))
    tx = optax.adam(1e-4)
    opt_state = tx.init(variables["params"])
    new_vars, opt_state, metrics = motr_clip_train_epoch(
        det, dict(variables), opt_state, tx, clips, max_targets=4)
    assert np.isfinite(metrics["loss"])
