"""COCO-RLE codec (utils/rle.py) and MOTS benchmark adapters over committed
mini benchmarks (tests/data/mots_mini, tests/data/kitti_mots_mini; built by
tests/make_mots_fixture.py).

Adapter anchors were produced by the reference's vendored TrackEval
(MOTSChallenge / KittiMOTS + HOTA/CLEAR/Identity at threshold 0.5) run on
the identical fixtures, with its pycocotools mask calls backed by this
repo's RLE codec (pycocotools is not installable here); the codec itself is
validated independently below (roundtrips, hand-decoded strings, IoU vs
dense-mask arithmetic).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from fastervit_tpu.tracking.mots import (KITTIMOTSDataset,
                                         MOTSChallengeDataset,
                                         load_mots_rows)
from fastervit_tpu.utils.rle import (rle_area, rle_decode, rle_encode,
                                     rle_iou, rle_merge)

DATA = os.path.join(os.path.dirname(__file__), "data")


# ---- RLE codec -----------------------------------------------------------

def test_rle_roundtrip_random():
    rng = np.random.RandomState(0)
    for shape in [(1, 1), (7, 3), (32, 64), (120, 240)]:
        for p in (0.05, 0.5, 0.95):
            m = (rng.rand(*shape) < p).astype(np.uint8)
            rle = rle_encode(m)
            assert rle_decode(rle).tolist() == m.tolist()
            assert rle_area(rle) == int(m.sum())


def test_rle_known_strings():
    """Hand-decoded examples of the pycocotools char encoding: 6-bit chars
    offset by 48, LSB-first, bit 0x20 continues, counts after the second
    are deltas vs counts[i-2]."""
    # all-zero 3x3: counts [9] -> single char chr(48+9)
    assert rle_encode(np.zeros((3, 3), np.uint8))["counts"] == "9"
    # all-one 3x3: counts [0, 9] -> chr(48+0) chr(48+9)
    assert rle_encode(np.ones((3, 3), np.uint8))["counts"] == "09"
    # negative delta: column-major runs [2,2,2,2,1] over a 3x3 ->
    # counts[4] stored as 1-2=-1: sign-extended single char 0x1f -> 'O'
    m = np.array([[0, 0, 0], [0, 0, 0], [1, 1, 1]], np.uint8).T
    rle = rle_encode(np.asarray(m))
    assert rle_decode(rle).tolist() == m.tolist()
    # multi-char value: a run of 2000 needs two 5-bit groups
    big = np.zeros((50, 50), np.uint8)
    big.flat[2000:] = 1
    r = rle_encode(np.asarray(big, order="F"))
    assert rle_area(r) == 500 and rle_decode(r).sum() == 500


def test_rle_column_major_order():
    m = np.zeros((2, 3), np.uint8)
    m[0, 1] = 1          # Fortran-flat index 2 -> counts [2, 1, 3]
    rle = rle_encode(m)
    assert rle_decode(rle)[0, 1] == 1 and rle_area(rle) == 1


def test_rle_merge_and_iou():
    a = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b = np.zeros((10, 10), np.uint8)
    b[3:8] = 1
    ra, rb = rle_encode(a), rle_encode(b)
    assert rle_area(rle_merge([ra, rb])) == 80            # union
    assert rle_area(rle_merge([ra, rb], intersect=True)) == 20
    iou = rle_iou([ra], [rb])[0, 0]
    assert abs(iou - 20 / 80) < 1e-12
    ioa = rle_iou([ra], [rb], iscrowd=[1])[0, 0]          # inter/area(a)
    assert abs(ioa - 20 / 50) < 1e-12
    empty = rle_merge([])
    assert empty["size"] == [0, 0] and rle_area(empty) == 0
    assert rle_iou([ra], [empty])[0, 0] == 0.0


# ---- adapters --------------------------------------------------------------

def _check(got, want):
    for k, v in want.items():
        assert abs(float(got[k]) - v) < 1e-5, (k, float(got[k]), v)


def test_mots_challenge_oracle():
    ds = MOTSChallengeDataset(
        os.path.join(DATA, "mots_mini", "gt", "mot_challenge"),
        os.path.join(DATA, "mots_mini", "trackers", "mot_challenge"),
        split="train")
    assert ds.seq_lengths == {"MOTS-mini-01": 10}
    res = ds.evaluate()["minitracker"]
    _check(res["COMBINED_SEQ"], {
        "HOTA": 0.757028, "DetA": 0.764352, "AssA": 0.753289,
        "LocA": 0.887021, "MOTA": 0.75, "MOTP": 0.879025, "IDSW": 1,
        "CLR_TP": 16, "CLR_FN": 0, "CLR_FP": 3, "MT": 2, "Frag": 0,
        "IDF1": 0.742857})


def test_kitti_mots_oracle():
    ds = KITTIMOTSDataset(os.path.join(DATA, "kitti_mots_mini", "gt"),
                          os.path.join(DATA, "kitti_mots_mini", "trackers"))
    assert ds.seq_lengths == {"0002": 8, "0003": 5}
    res = ds.evaluate()["minitracker"]
    _check(res["car"]["COMBINED_SEQ"], {
        "HOTA": 0.550715, "DetA": 0.550607, "AssA": 0.550822,
        "MOTA": 0.615385, "CLR_TP": 8, "CLR_FN": 5, "CLR_FP": 0,
        "IDF1": 0.761905})
    _check(res["pedestrian"]["COMBINED_SEQ"], {
        "HOTA": 0.737958, "MOTA": 0.714286, "IDSW": 1, "CLR_TP": 14,
        "CLR_FP": 3, "IDF1": 0.709677})
    _check(res["car"]["0003"], {"HOTA": 0.536842, "CLR_FN": 2})
    # class with no gt and no dets in a sequence: zero row
    _check(res["pedestrian"]["0003"], {"HOTA": 0.0, "MOTA": 0.0,
                                       "LocA": 1.0})


def test_mots_ignore_region_removal():
    """Tracker id 14 lives fully inside the crowd-ignore region and must be
    removed; id 15 is a plain FP and must survive."""
    ds = MOTSChallengeDataset(
        os.path.join(DATA, "mots_mini", "gt", "mot_challenge"),
        os.path.join(DATA, "mots_mini", "trackers", "mot_challenge"),
        split="train")
    d = ds.sequence_data("minitracker", "MOTS-mini-01")
    # survivors: 11, 12, 13 (switch pair), 15 — id 14 removed
    assert d["num_tracker_ids"] == 4
    trk = load_mots_rows(os.path.join(
        DATA, "mots_mini", "trackers", "mot_challenge", "MOTS-train",
        "minitracker", "data", "MOTS-mini-01.txt"))
    assert len({tid for rows in trk.values() for tid, _, _ in rows}) == 5


def test_mots_overlap_validation(tmp_path):
    from fastervit_tpu.tracking.mots import _mots_frame_data
    m1 = rle_encode(np.ones((4, 4), np.uint8))
    m2 = rle_encode(np.eye(4, dtype=np.uint8))
    with pytest.raises(ValueError, match="overlapping"):
        _mots_frame_data([(1, 2, m1), (2, 2, m2)])
