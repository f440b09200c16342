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


def make_ytvis(root):
    """YouTube-VIS mini benchmark: gt tracks with uncompressed-RLE
    segmentations (the frPyObjects input form), a crowd track, None frames,
    and a tracker json with compressed-RLE results."""
    import json

    from fastervit_tpu.utils.rle import _string_to_counts

    def unc(rle):        # compressed -> uncompressed counts list
        return {"size": rle["size"], "counts": _string_to_counts(
            rle["counts"])}

    def gt_track(tid, vid, cat, segs, iscrowd=0):
        return {"id": tid, "video_id": vid, "category_id": cat,
                "segmentations": [unc(s) if s else None for s in segs],
                "areas": None,   # filled below from the run lengths
                "iscrowd": iscrowd, "height": H, "width": W}

    videos = [{"id": 1, "height": H, "width": W,
               "file_names": [f"vidA/{k:05d}.jpg" for k in range(5)]},
              {"id": 2, "height": H, "width": W,
               "file_names": [f"vidB/{k:05d}.jpg" for k in range(4)]}]
    categories = [{"id": 1, "name": "person"}, {"id": 2, "name": "dog"}]

    t1 = [rect(10 + 4 * k, 20, 40 + 4 * k, 80) for k in range(5)]
    crowd = [rect(150, 10, 230, 110)] * 5
    t3 = [None, rect(60, 90, 100, 115), rect(62, 90, 102, 115),
          rect(64, 90, 104, 115), None]
    t4 = [rect(100, 30, 140, 95)] * 4
    anns = [gt_track(1, 1, 1, t1), gt_track(2, 1, 1, crowd, iscrowd=1),
            gt_track(3, 1, 2, t3), gt_track(4, 2, 1, t4)]
    # fix areas: per-frame mask area or None
    for ann in anns:
        ann["areas"] = [None if s is None else int(sum(s["counts"][1::2]))
                        for s in ann["segmentations"]]
    gt = {"videos": videos, "categories": categories, "annotations": anns}

    def dt(vid, cat, score, segs):
        return {"video_id": vid, "category_id": cat, "score": score,
                "segmentations": [s if s else None for s in segs]}

    results = [
        dt(1, 1, 0.9, [rect(12 + 4 * k, 22, 42 + 4 * k, 82)
                       for k in range(5)]),          # follows track 1
        dt(1, 1, 0.8, [rect(160, 20, 225, 105)] * 5),  # inside crowd
        dt(1, 2, 0.7, [None, rect(61, 91, 101, 116), rect(63, 91, 103, 116),
                       rect(65, 91, 105, 116), None]),  # follows track 3
        dt(1, 1, 0.6, [rect(150, 115, 180, 120)] * 3 + [None, None]),  # FP
        dt(2, 1, 0.85, [rect(101, 31, 141, 96)] * 4),  # follows track 4
    ]
    os.makedirs(os.path.join(root, "gt"), exist_ok=True)
    os.makedirs(os.path.join(root, "trackers", "minitracker", "data"),
                exist_ok=True)
    with open(os.path.join(root, "gt", "ytvis_mini.json"), "w") as f:
        json.dump(gt, f)
    with open(os.path.join(root, "trackers", "minitracker", "data",
                           "results.json"), "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    make_mots(os.path.join(ROOT, "mots_mini"))
    make_kitti_mots(os.path.join(ROOT, "kitti_mots_mini"))
    make_ytvis(os.path.join(ROOT, "ytvis_mini"))
    print("fixtures written under", ROOT)
