"""Generator for the committed mini MOTChallenge benchmark fixture
(tests/data/mot_mini). Deterministic; rerun only to regenerate the fixture —
the golden CSV (golden_mini_detailed.csv) pins the expected metric values
(the reference's TrackEval golden-regression pattern,
TrackEval/tests/test_all_quick.py:24-60).

Usage: python tests/make_mot_fixture.py [--golden]
"""
import os
import sys

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                    "mot_mini")
BENCH, SPLIT = "MINI", "train"
SEQS = {"seq01": 20, "seq02": 15}


def _track(rng, n_frames, start, end, x0, y0, vx, vy, w, h):
    rows = []
    for t in range(start, min(end, n_frames) + 1):
        rows.append((t, x0 + vx * (t - start), y0 + vy * (t - start), w, h))
    return rows


def main(write_golden=False):
    gt_set = f"{BENCH}-{SPLIT}"
    gt_root = os.path.join(ROOT, "gt", "mot_challenge")
    trk_root = os.path.join(ROOT, "trackers", "mot_challenge", gt_set,
                            "minitracker", "data")
    os.makedirs(os.path.join(gt_root, "seqmaps"), exist_ok=True)
    os.makedirs(trk_root, exist_ok=True)
    with open(os.path.join(gt_root, "seqmaps", gt_set + ".txt"), "w") as f:
        f.write("name\n" + "\n".join(SEQS) + "\n")

    rng = np.random.RandomState(0)
    for seq, nf in SEQS.items():
        seq_dir = os.path.join(gt_root, gt_set, seq, "gt")
        os.makedirs(seq_dir, exist_ok=True)
        with open(os.path.join(seq_dir, "..", "seqinfo.ini"), "w") as f:
            f.write(f"[Sequence]\nname={seq}\nimDir=img1\nframeRate=20\n"
                    f"seqLength={nf}\nimWidth=1920\nimHeight=1080\n")
        gt_lines, trk_lines = [], []
        tracks = [
            (1, _track(rng, nf, 1, nf, 100, 100, 12, 4, 80, 180)),
            (2, _track(rng, nf, 3, nf - 2, 600, 300, -8, 6, 70, 160)),
            (3, _track(rng, nf, 1, nf // 2, 1200, 500, 5, -3, 90, 200)),
        ]
        for tid, rows in tracks:
            for (t, x, y, w, h) in rows:
                gt_lines.append(f"{t},{tid},{x:.2f},{y:.2f},{w:.2f},{h:.2f},"
                                f"1,1,1.0")
        # distractor gt (class 8) + an ignored zero-marked row (seq01 only)
        if seq == "seq01":
            for t in range(5, 12):
                gt_lines.append(f"{t},9,400,700,60,150,1,8,1.0")
            gt_lines.append("2,10,900,100,50,120,0,1,1.0")
        # tracker: noisy copies of tracks 1-2 (id switch on 2), misses most
        # of 3, follows the distractor for a few frames, one roaming FP
        for tid, rows in tracks:
            for (t, x, y, w, h) in rows:
                if tid == 3 and t > 3:
                    continue
                out_id = tid if not (tid == 2 and t > nf // 2) else 22
                jx, jy = rng.uniform(-12, 12, 2)
                trk_lines.append(f"{t},{out_id},{x + jx:.2f},{y + jy:.2f},"
                                 f"{w:.2f},{h:.2f},0.9")
        if seq == "seq01":
            for t in range(6, 10):
                trk_lines.append(f"{t},40,402,702,60,150,0.8")
        for t in range(1, nf + 1, 4):
            trk_lines.append(f"{t},50,{1500 + 3 * t},800,60,140,0.5")

        def _key(s):
            p = s.split(",")
            return (int(p[0]), int(p[1]))
        with open(os.path.join(seq_dir, "gt.txt"), "w") as f:
            f.write("\n".join(sorted(gt_lines, key=_key)) + "\n")
        with open(os.path.join(trk_root, seq + ".txt"), "w") as f:
            f.write("\n".join(sorted(trk_lines, key=_key)) + "\n")

    if write_golden:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from fastervit_tpu.tracking.benchmarks import MOTChallengeDataset
        ds = MOTChallengeDataset(
            os.path.join(ROOT, "gt", "mot_challenge"),
            os.path.join(ROOT, "trackers", "mot_challenge"),
            benchmark=BENCH, split=SPLIT)
        ds.evaluate(output_folder=ROOT)
        os.replace(os.path.join(ROOT, "minitracker_detailed.csv"),
                   os.path.join(ROOT, "golden_mini_detailed.csv"))
        print("golden written")


if __name__ == "__main__":
    main(write_golden="--golden" in sys.argv)
