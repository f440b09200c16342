"""Generate the committed mini DAVIS benchmark (tests/data/davis_mini):
indexed PNG frames (object ids as pixel values, 255 = void region).

Exercises: multi-object J&F with Hungarian track matching, a void region
that clears overlapping tracker pixels, an unmatched gt object (zero rows),
and a tracker FP object.

Run from the repo root: python tests/make_davis_fixture.py
"""
import os

import numpy as np
from PIL import Image

ROOT = os.path.join(os.path.dirname(__file__), "data", "davis_mini")
H, W = 64, 96


def write_seq(folder, frames):
    os.makedirs(folder, exist_ok=True)
    for t, frame in enumerate(frames):
        Image.fromarray(frame.astype(np.uint8), mode="L").save(
            os.path.join(folder, f"{t:05d}.png"))


def main():
    gt_a, trk_a = [], []
    for t in range(6):
        g = np.zeros((H, W), np.uint8)
        g[10:30, 5 + 3 * t:25 + 3 * t] = 1          # obj 1 drifts right
        if t < 4:
            g[40:60, 20:45] = 2                     # obj 2, frames 0-3
        if t in (2, 3):
            g[5:25, 70:90] = 255                    # void region
        gt_a.append(g)
        d = np.zeros((H, W), np.uint8)
        d[11:31, 6 + 3 * t:26 + 3 * t] = 1          # follows obj 1
        if t < 4:
            d[41:61, 21:46] = 5                     # follows obj 2 (id 5)
        if t < 3:
            d[8:28, 72:92] = 9                      # FP; hits void at t=2
        trk_a.append(d)
    gt_b, trk_b = [], []
    for t in range(4):
        g = np.zeros((H, W), np.uint8)
        g[20:40, 30:60] = 1
        g[5:15, 5:20] = 2                           # never tracked
        gt_b.append(g)
        d = np.zeros((H, W), np.uint8)
        if t < 2:
            d[22:42, 32:62] = 1
        trk_b.append(d)
    write_seq(os.path.join(ROOT, "gt", "seqA"), gt_a)
    write_seq(os.path.join(ROOT, "gt", "seqB"), gt_b)
    write_seq(os.path.join(ROOT, "trackers", "minitracker", "data", "seqA"),
              trk_a)
    write_seq(os.path.join(ROOT, "trackers", "minitracker", "data", "seqB"),
              trk_b)
    print("fixture written under", ROOT)


if __name__ == "__main__":
    main()
