"""Generate the committed mini KITTI / BDD100K tracking benchmarks
(tests/data/kitti_mini, tests/data/bdd_mini).

Deterministic fixtures exercising every preprocessing branch of the
TrackEval dataset semantics (kitti_2d_box.py / bdd100k.py):
distractor-matched removal (van / person), occlusion+truncation gating,
min-height and dontcare-region removal of unmatched dets, crowd-ignore
regions, per-class evaluation, an ID switch, and plain FPs/FNs.

Run from the repo root: python tests/make_kitti_bdd_fixture.py
"""
import json
import os

ROOT = os.path.join(os.path.dirname(__file__), "data")


def _w(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def kitti_gt_row(t, tid, cls, trunc, occ, box):
    x1, y1, x2, y2 = box
    return (f"{t} {tid} {cls} {trunc} {occ} 0.0 "
            f"{x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
            "1.5 1.6 3.6 0.0 1.7 10.0 0.0")


def kitti_trk_row(t, tid, cls, box, score=0.9):
    x1, y1, x2, y2 = box
    return (f"{t} {tid} {cls} 0 0 0.0 "
            f"{x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
            f"1.5 1.6 3.6 0.0 1.7 10.0 0.0 {score:.2f}")


def make_kitti(root):
    gt0, trk0 = [], []
    for t in range(20):
        # car 1: tracked for all 20 frames with a small offset
        b = (100 + 5 * t, 150, 180 + 5 * t, 210)
        gt0.append(kitti_gt_row(t, 1, "Car", 0, 0, b))
        trk0.append(kitti_trk_row(t, 11, "Car",
                                  (b[0] + 2, b[1] + 2, b[2] + 2, b[3] + 2)))
        # car 2 (frames 0-14): tracker switches id 12 -> 13 at frame 10
        if t < 15:
            b = (400 + 3 * t, 160, 470 + 3 * t, 220)
            gt0.append(kitti_gt_row(t, 2, "Car", 0, 0, b))
            trk0.append(kitti_trk_row(t, 12 if t < 10 else 13, "Car",
                                      (b[0] + 1, b[1], b[2] + 1, b[3])))
        # van 3 = car distractor; tracker follows frames 0-7 (removed)
        b = (700, 150, 800, 230)
        gt0.append(kitti_gt_row(t, 3, "Van", 0, 0, b))
        if t < 8:
            trk0.append(kitti_trk_row(t, 14, "Car", b))
        # car 4 truncated: matched dets removed, gt excluded
        b = (900, 140, 1000, 220)
        gt0.append(kitti_gt_row(t, 4, "Car", 1, 0, b))
        if t < 5:
            trk0.append(kitti_trk_row(t, 15, "Car", b))
        # car 5 over-occluded (frames 5-12): excluded gt, never tracked
        if 5 <= t < 13:
            gt0.append(kitti_gt_row(t, 5, "Car", 0, 3, (50, 250, 150, 330)))
        # dontcare region; unmatched det inside frames 0-9 (removed)
        gt0.append(kitti_gt_row(t, -1, "DontCare", -1, -1,
                                (1100, 100, 1200, 300)))
        if t < 10:
            trk0.append(kitti_trk_row(t, 16, "Car", (1110, 110, 1190, 290)))
        # tiny unmatched det (height 20 <= 25): removed
        trk0.append(kitti_trk_row(t, 17, "Car", (300, 300, 340, 320)))
        # plain FP frames 0-4: stays
        if t < 5:
            trk0.append(kitti_trk_row(t, 18, "Car", (600, 300, 680, 360)))
        # pedestrian 6: tracked throughout
        b = (200, 100, 230, 180)
        gt0.append(kitti_gt_row(t, 6, "Pedestrian", 0, 0, b))
        trk0.append(kitti_trk_row(t, 21, "Pedestrian",
                                  (b[0] + 1, b[1] + 1, b[2] + 1, b[3] + 1)))
        # person (sitting) 7 = pedestrian distractor; followed frames 0-5
        b = (250, 100, 280, 180)
        gt0.append(kitti_gt_row(t, 7, "Person", 0, 0, b))
        if t < 6:
            trk0.append(kitti_trk_row(t, 22, "Pedestrian", b))
    gt1, trk1 = [], []
    for t in range(10):
        b = (80 + 4 * t, 170, 170 + 4 * t, 235)
        gt1.append(kitti_gt_row(t, 1, "Car", 0, 0, b))
        trk1.append(kitti_trk_row(t, 31, "Car",
                                  (b[0] + 3, b[1], b[2] + 3, b[3])))
        gt1.append(kitti_gt_row(t, 2, "Pedestrian", 0, 0,
                                (500, 110, 530, 190)))
        if t < 5:
            trk1.append(kitti_trk_row(t, 32, "Pedestrian",
                                      (501, 111, 531, 191)))
    _w(os.path.join(root, "gt", "evaluate_tracking.seqmap.training"),
       ["0000 empty 000000 000020", "0001 empty 000000 000010"])
    _w(os.path.join(root, "gt", "label_02", "0000.txt"), gt0)
    _w(os.path.join(root, "gt", "label_02", "0001.txt"), gt1)
    _w(os.path.join(root, "trackers", "minitracker", "data", "0000.txt"),
       trk0)
    _w(os.path.join(root, "trackers", "minitracker", "data", "0001.txt"),
       trk1)


def bdd_label(tid, cat, box, crowd=None):
    d = {"id": tid, "category": cat,
         "box2d": {"x1": float(box[0]), "y1": float(box[1]),
                   "x2": float(box[2]), "y2": float(box[3])}}
    if crowd is not None:
        d["attributes"] = {"Crowd": bool(crowd)}
    return d


def make_bdd(root):
    gt_a, trk_a = [], []
    for t in range(8):
        labels = [
            bdd_label(1, "car", (100 + 10 * t, 200, 220 + 10 * t, 280),
                      crowd=False),
            bdd_label(2, "pedestrian", (400, 100, 440, 200)),
            bdd_label(3, "rider", (600, 120, 640, 210)),
            # crowd pedestrian group -> ignore region
            bdd_label(4, "pedestrian", (800, 100, 1000, 260), crowd=True),
            # distractor class -> ignore region
            bdd_label(5, "other vehicle", (1100, 200, 1240, 300)),
        ]
        gt_a.append({"index": t, "labels": labels})
        tl = [bdd_label(101, "car",
                        (102 + 10 * t, 202, 222 + 10 * t, 282))]
        if t < 6:
            tl.append(bdd_label(102, "pedestrian", (401, 101, 441, 201)))
        # unmatched det inside the crowd region: removed by preproc
        tl.append(bdd_label(103, "pedestrian", (820, 110, 900, 250)))
        if t < 4:  # unmatched det inside the distractor region: removed
            tl.append(bdd_label(104, "car", (1110, 210, 1230, 295)))
        if t < 3:  # plain FP in empty space: stays
            tl.append(bdd_label(105, "car", (50, 300, 150, 350)))
        trk_a.append({"index": t, "labels": tl})
    gt_b, trk_b = [], []
    for t in range(5):
        gt_b.append({"index": t, "labels": [
            bdd_label(1, "car", (300, 150, 420, 240))]})
        trk_b.append({"index": t, "labels": [
            bdd_label(201 if t < 3 else 202, "car",
                      (302, 151, 422, 241))]})
    _w(os.path.join(root, "gt", "seqA.json"), [json.dumps(gt_a)])
    _w(os.path.join(root, "gt", "seqB.json"), [json.dumps(gt_b)])
    _w(os.path.join(root, "trackers", "minitracker", "data", "seqA.json"),
       [json.dumps(trk_a)])
    _w(os.path.join(root, "trackers", "minitracker", "data", "seqB.json"),
       [json.dumps(trk_b)])


def mot_row(t, tid, box, conf=1, cls=1, vis=1.0):
    x, y, w, h = box
    return f"{t},{tid},{x},{y},{w},{h},{conf},{cls},{vis}"


def make_ht(root):
    """Head Tracking (CroHD) mini benchmark: visibility-zero and
    zero-marked gt, a static-class distractor, plain FPs."""
    gt, trk = [], []
    for t in range(1, 13):
        # ped 1: tracked throughout
        gt.append(mot_row(t, 1, (50 + 3 * t, 40, 20, 24)))
        trk.append(mot_row(t, 31, (51 + 3 * t, 41, 20, 24)))
        # ped 2: invisible from frame 7 on; follower dets there removed
        vis = 1.0 if t <= 6 else 0.0
        gt.append(mot_row(t, 2, (150, 60, 22, 26), vis=vis))
        trk.append(mot_row(t, 32, (151, 61, 22, 26)))
        # static head 3 (class 2): follower removed as distractor
        gt.append(mot_row(t, 3, (250, 80, 20, 22), cls=2))
        if t <= 4:
            trk.append(mot_row(t, 33, (250, 80, 20, 22)))
        # zero-marked ped 4: gt excluded; its follower dets are KEPT
        # (the reference's conf<eps removal is dead code)
        gt.append(mot_row(t, 4, (350, 100, 20, 22), conf=0))
        if t <= 5:
            trk.append(mot_row(t, 34, (351, 101, 20, 22)))
        # free-space FP
        if t <= 3:
            trk.append(mot_row(t, 35, (450, 150, 18, 20)))
    seq = "HT-mini-01"
    _w(os.path.join(root, "gt", "mot_challenge", "HT-train", seq,
                    "gt", "gt.txt"), gt)
    _w(os.path.join(root, "gt", "mot_challenge", "HT-train", seq,
                    "seqinfo.ini"),
       ["[Sequence]", f"name={seq}", "seqLength=12"])
    _w(os.path.join(root, "gt", "mot_challenge", "seqmaps", "HT-train.txt"),
       ["name", seq])
    _w(os.path.join(root, "trackers", "mot_challenge", "HT-train",
                    "minitracker", "data", seq + ".txt"), trk)


if __name__ == "__main__":
    make_kitti(os.path.join(ROOT, "kitti_mini"))
    make_bdd(os.path.join(ROOT, "bdd_mini"))
    make_ht(os.path.join(ROOT, "ht_mini"))
    print("fixtures written under", ROOT)
