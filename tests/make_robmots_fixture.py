"""Generate the committed mini RobMOTS benchmark (tests/data/robmots_mini):
the unified multi-benchmark format with one mask sub-benchmark
(mots_challenge) and one box-gt sub-benchmark (tao).

Exercises: class + 'all' evaluation, general (100) and class-specific
(cls+100) ignore regions, sequence-level ignore classes, the min-size
filter (min(seq_size)/8), non-evaluated-class removal under 'all', and the
gt-box vs tracker-mask-bbox similarity of box-gt benchmarks.

Run from the repo root: python tests/make_robmots_fixture.py
"""
import os

import numpy as np

from fastervit_tpu.utils.rle import rle_encode

ROOT = os.path.join(os.path.dirname(__file__), "data", "robmots_mini")
H, W = 120, 240


def rect_rle(x0, y0, x1, y1, h=H, w=W):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return rle_encode(m)


def mask_row(fr, tid, cls, rle, conf=None, h=H, w=W):
    c = "" if conf is None else f" {conf:.2f}"
    head = f"{fr} {tid} {cls}"
    pad = " 1" if conf is None else c
    return f"{head}{pad} {h} {w} {rle['counts']}"


def box_row(fr, tid, cls, box, conf=None):
    c = " 1" if conf is None else f" {conf:.2f}"
    x0, y0, x1, y1 = box
    return f"{fr} {tid} {cls}{c} {x0:.1f} {y0:.1f} {x1:.1f} {y1:.1f}"


def _w(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def make_mots_sub(base, trk_base):
    gt, trk = [], []
    for t in range(8):
        # person 1 tracked; car 2 tracked
        gt.append(mask_row(t, 1, 1, rect_rle(10 + 3 * t, 20, 50 + 3 * t,
                                             90)))
        trk.append(mask_row(t, 11, 1, rect_rle(12 + 3 * t, 22, 52 + 3 * t,
                                               92), 0.9))
        gt.append(mask_row(t, 2, 3, rect_rle(90, 30, 130, 80)))
        trk.append(mask_row(t, 12, 3, rect_rle(91, 31, 131, 81), 0.8))
        # general ignore region (class 100) + person-specific (101)
        gt.append(mask_row(t, 9001, 100, rect_rle(200, 0, 240, 60)))
        gt.append(mask_row(t, 9002, 101, rect_rle(200, 60, 240, 120)))
        if t < 5:  # unmatched person det inside the 101 region: removed
            trk.append(mask_row(t, 13, 1, rect_rle(205, 65, 235, 115),
                                0.7))
        if t < 4:  # tiny unmatched det (12x12 <= 120/8): removed
            trk.append(mask_row(t, 14, 1, rect_rle(140, 10, 152, 22),
                                0.6))
        if t < 3:  # unmatched bicycle: class 2 is seq-ignore-listed
            trk.append(mask_row(t, 15, 2, rect_rle(140, 40, 170, 70),
                                0.5))
        if t < 2:  # unmatched dog (17): not in clsmap -> removed in 'all'
            trk.append(mask_row(t, 17, 17, rect_rle(140, 80, 170, 110),
                                0.5))
        if t < 6:  # plain person FP, big enough and in free space: kept
            trk.append(mask_row(t, 16, 1, rect_rle(60, 95, 110, 118),
                                0.4))
    _w(os.path.join(base, "seqmap.txt"), [f"seqM 8 {H} {W} 2"])
    _w(os.path.join(base, "clsmap.txt"), ["1 2 3"])
    _w(os.path.join(base, "data", "seqM.txt"), gt)
    _w(os.path.join(trk_base, "seqM.txt"), trk)


def make_tao_sub(base, trk_base):
    h, w = 100, 200
    gt, trk = [], []
    for t in range(6):
        gt.append(box_row(t, 1, 1, (20 + 4 * t, 10, 60 + 4 * t, 80)))
        trk.append(mask_row(t, 21, 1,
                            rect_rle(22 + 4 * t, 12, 62 + 4 * t, 82, h, w),
                            0.9, h, w))
        gt.append(box_row(t, 2, 3, (100, 20, 150, 70)))
        if t < 4:
            trk.append(mask_row(t, 22, 3, rect_rle(101, 21, 151, 71, h, w),
                                0.85, h, w))
        # ignore region as a box row (class 100)
        gt.append(box_row(t, 9001, 100, (160, 0, 200, 50)))
        if t < 3:  # unmatched det mostly inside the ignore box: removed
            trk.append(mask_row(t, 23, 1, rect_rle(165, 5, 195, 45, h, w),
                                0.7, h, w))
        if t < 2:  # FP in free space: kept
            trk.append(mask_row(t, 24, 1, rect_rle(160, 60, 195, 95, h, w),
                                0.6, h, w))
    _w(os.path.join(base, "seqmap.txt"), [f"seqT 6 {h} {w}"])
    _w(os.path.join(base, "clsmap.txt"), ["1 3"])
    _w(os.path.join(base, "data", "seqT.txt"), gt)
    _w(os.path.join(trk_base, "seqT.txt"), trk)


if __name__ == "__main__":
    make_mots_sub(os.path.join(ROOT, "gt", "train", "mots_challenge"),
                  os.path.join(ROOT, "trackers", "train", "minitracker",
                               "data", "mots_challenge"))
    make_tao_sub(os.path.join(ROOT, "gt", "train", "tao"),
                 os.path.join(ROOT, "trackers", "train", "minitracker",
                              "data", "tao"))
    print("fixture written under", ROOT)
