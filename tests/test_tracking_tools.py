"""Tracking host tools: det_db sweep, tracklet stitching, visualization.

Semantics mirrored from reference motrv2/tools (make_detdb.py,
merge_dance_tracklets.py, visualize.py)."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke
from PIL import Image

from fastervit_tpu.tracking.tools import (build_det_db, merge_tracklet_dir,
                                          merge_tracklets, visualize_tracks)


def _row(frame, tid, x=10.0, y=10.0, w=5.0, h=5.0):
    return f"{frame},{tid},{x},{y},{w},{h},1,-1,-1,-1\n"


def test_merge_simple_gap():
    # track 1 ends at t=10, track 2 starts at t=60: gap 50 in (20, 100) and
    # unambiguous -> merged under id 1
    lines = [_row(t, 1) for t in range(1, 11)] + \
            [_row(t, 2) for t in range(60, 70)]
    merged = merge_tracklets(lines)
    ids = {int(l.split(",")[1]) for l in merged}
    assert ids == {1}


def test_merge_respects_t_min_t_max():
    # gap 5 < t_min: no merge
    lines = [_row(t, 1) for t in range(1, 11)] + \
            [_row(t, 2) for t in range(15, 25)]
    ids = {int(l.split(",")[1]) for l in merge_tracklets(lines)}
    assert ids == {1, 2}
    # gap 500 > t_max: no merge
    lines = [_row(t, 1) for t in range(1, 11)] + \
            [_row(t, 2) for t in range(510, 520)]
    ids = {int(l.split(",")[1]) for l in merge_tracklets(lines)}
    assert ids == {1, 2}


def test_merge_ambiguity_guard():
    # two tracklets (1 and 3) both end within t_max before track 2 starts:
    # the junction is ambiguous -> nothing merges into 2
    lines = ([_row(t, 1) for t in range(1, 11)]
             + [_row(t, 3) for t in range(1, 13)]
             + [_row(t, 2) for t in range(60, 70)])
    ids = {int(l.split(",")[1]) for l in merge_tracklets(lines)}
    assert 2 in ids and len(ids) == 3


def test_merge_dir_and_det_db(tmp_path):
    seq_dir = tmp_path / "results"
    seq_dir.mkdir()
    (seq_dir / "seq1.txt").write_text("".join(
        [_row(t, 7) for t in range(1, 6)] + [_row(t, 9) for t in range(40, 45)]))
    merge_tracklet_dir(str(seq_dir), str(tmp_path / "out"))
    merged = (tmp_path / "out" / "tracker" / "seq1.txt").read_text()
    assert {int(l.split(",")[1]) for l in merged.strip().split("\n")} == {7}

    # det_db sweep
    d = tmp_path / "props" / "img1"
    d.mkdir(parents=True)
    (d / "000001.txt").write_text("1,2,3,4,0.9\n")
    (d / "000002.txt").write_text("5,6,7,8,0.8\n2,3,4,5,0.7\n")
    db = build_det_db([str(tmp_path / "props")],
                      output=str(tmp_path / "det_db.json"))
    assert len(db) == 2
    reread = json.load(open(tmp_path / "det_db.json"))
    assert reread[str(d / "000002.txt")][1] == "2,3,4,5,0.7\n"


def test_visualize_tracks(tmp_path):
    frames = []
    for i in range(1, 4):
        p = tmp_path / f"frame{i}.jpg"
        Image.fromarray(np.full((64, 96, 3), 200, np.uint8)).save(p)
        frames.append(str(p))
    trk = tmp_path / "trk.txt"
    trk.write_text("".join([_row(1, 3, 10, 10, 30, 30),
                            _row(2, 3, 14, 12, 30, 30),
                            _row(3, 3, 18, 14, 30, 30)]))
    out = visualize_tracks(str(trk), frames, str(tmp_path / "vis"))
    assert len(out) == 3
    arr = np.asarray(Image.open(out[0]))
    assert arr.shape == (64, 96, 3)
    # a box was drawn: the frame is no longer uniform
    assert arr.std() > 1.0
