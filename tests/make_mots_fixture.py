"""Generate the committed mini MOTS benchmarks (tests/data/mots_mini for
MOTSChallenge, tests/data/kitti_mots_mini for KITTI-MOTS).

Rectangle masks encoded with the repo's COCO-RLE codec; exercises mask-IoU
similarity, merged crowd-ignore regions (unmatched dets > 50% inside are
removed), an ID switch, FPs/FNs, and both frame conventions (MOTS 1-based,
KITTI 0-based).

Run from the repo root: python tests/make_mots_fixture.py
"""
import os

import numpy as np

from fastervit_tpu.utils.rle import rle_encode

ROOT = os.path.join(os.path.dirname(__file__), "data")
H, W = 120, 240


def rect(x0, y0, x1, y1):
    m = np.zeros((H, W), np.uint8)
    m[y0:y1, x0:x1] = 1
    return rle_encode(m)


def row(frame, tid, cls, rle):
    return f"{frame} {tid} {cls} {H} {W} {rle['counts']}"


def _w(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def mots_seq(frames, base):
    """Build (gt_lines, trk_lines) for one sequence; frame ids from
    `frames` (1-based for MOTS, 0-based for KITTI)."""
    gt, trk = [], []
    for k, fr in enumerate(frames):
        # ped track 1: drifting rect; follower id 11 shifted by 3px
        gt.append(row(fr, base + 1, 2, rect(10 + 2 * k, 20, 50 + 2 * k, 90)))
        trk.append(row(fr, 11, 2, rect(13 + 2 * k, 20, 53 + 2 * k, 90)))
        # ped track 2 (first 6 frames): follower switches id 12 -> 13
        if k < 6:
            gt.append(row(fr, base + 2, 2, rect(80, 30, 110, 100)))
            trk.append(row(fr, 12 if k < 3 else 13, 2,
                           rect(81, 31, 111, 101)))
        # crowd ignore region on the right; det id 14 fully inside ->
        # removed; det id 15 is a plain FP in free space -> kept
        gt.append(row(fr, 10000, 10, rect(180, 0, 240, 120)))
        if k < 4:
            trk.append(row(fr, 14, 2, rect(190, 10, 220, 60)))
        if k < 3:
            trk.append(row(fr, 15, 2, rect(130, 60, 160, 110)))
    return gt, trk


def make_mots(root):
    frames = list(range(1, 11))
    gt, trk = mots_seq(frames, base=2000)
    seq = "MOTS-mini-01"
    _w(os.path.join(root, "gt", "mot_challenge", "MOTS-train", seq,
                    "gt", "gt.txt"), gt)
    _w(os.path.join(root, "gt", "mot_challenge", "MOTS-train", seq,
                    "seqinfo.ini"),
       ["[Sequence]", f"name={seq}", "seqLength=10"])
    _w(os.path.join(root, "gt", "mot_challenge", "seqmaps",
                    "MOTS-train.txt"), ["name", seq])
    _w(os.path.join(root, "trackers", "mot_challenge", "MOTS-train",
                    "minitracker", "data", seq + ".txt"), trk)


def make_kitti_mots(root):
    frames = list(range(8))
    gt, trk = mots_seq(frames, base=2000)
    # add a car track (class 1) + follower to exercise per-class eval
    for k, fr in enumerate(frames):
        gt.append(row(fr, 1001, 1, rect(115, 0, 175, 55)))
        if k < 5:
            trk.append(row(fr, 21, 1, rect(117, 2, 177, 57)))
    _w(os.path.join(root, "gt", "evaluate_mots.seqmap.val"),
       ["0002 empty 000000 000008", "0003 empty 000000 000005"])
    _w(os.path.join(root, "gt", "label_02", "0002.txt"), gt)
    _w(os.path.join(root, "trackers", "minitracker", "data", "0002.txt"),
       trk)
    # short car-only second sequence: tracked 0-2, missed 3-4 (FNs)
    gt2, trk2 = [], []
    for fr in range(5):
        gt2.append(row(fr, 1001, 1, rect(40, 10, 100, 70)))
        if fr < 3:
            trk2.append(row(fr, 31, 1, rect(42, 12, 102, 72)))
    _w(os.path.join(root, "gt", "label_02", "0003.txt"), gt2)
    _w(os.path.join(root, "trackers", "minitracker", "data", "0003.txt"),
       trk2)


if __name__ == "__main__":
    make_mots(os.path.join(ROOT, "mots_mini"))
    make_kitti_mots(os.path.join(ROOT, "kitti_mots_mini"))
    print("fixtures written under", ROOT)
