"""DAVIS benchmark adapter + J&F metric over the committed mini benchmark
(tests/data/davis_mini; built by tests/make_davis_fixture.py).

Anchors were produced by the reference's vendored TrackEval (DAVIS dataset
+ HOTA/CLEAR/Identity + JAndF) on the identical fixture; the boundary-F
path (seg2bmap + disk dilation) ran entirely in the reference's own code,
so the J&F values are an independent check of this port. All values match
to 6 decimals.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from fastervit_tpu.tracking.davis import (DAVISDataset, boundary_f,
                                          combine_j_and_f, j_and_f_metrics,
                                          seg2bmap)

ROOT = os.path.join(os.path.dirname(__file__), "data", "davis_mini")


@pytest.fixture(scope="module")
def results():
    ds = DAVISDataset(os.path.join(ROOT, "gt"),
                      os.path.join(ROOT, "trackers"))
    return ds.evaluate()["minitracker"]


def _check(got, want):
    for k, v in want.items():
        assert abs(float(got[k]) - v) < 1e-5, (k, float(got[k]), v)


def test_seqA_oracle(results):
    """Exercises: two matched objects (one under a different tracker id),
    an FP object, and void-region pixel clearing at t=2."""
    _check(results["seqA"], {
        "HOTA": 0.738575, "DetA": 0.647773, "AssA": 0.842105,
        "MOTA": 0.7, "CLR_TP": 10, "CLR_FN": 0, "CLR_FP": 3,
        "IDF1": 0.869565,
        "J-Mean": 0.85724, "J-Recall": 1.0, "J-Decay": -0.080882,
        "F-Mean": 0.990046, "F-Recall": 1.0, "J&F": 0.923643})


def test_seqB_oracle(results):
    """Exercises: an unmatched gt object (zero J/F rows) and a track that
    disappears halfway (decay)."""
    _check(results["seqB"], {
        "HOTA": 0.260513, "MOTA": 0.25, "CLR_TP": 2, "CLR_FN": 6,
        "J-Mean": 0.181034, "J-Recall": 0.25, "J-Decay": 0.362069,
        "F-Mean": 0.015, "F-Recall": 0.0, "J&F": 0.098017})


def test_combined_weighted(results):
    """COMBINED_SEQ is the num_gt_tracks-weighted J&F average (both
    sequences have 2 gt tracks here, so the plain mean) + pooled HOTA."""
    _check(results["COMBINED_SEQ"], {
        "HOTA": 0.602696, "MOTA": 0.5, "CLR_TP": 12, "CLR_FP": 3,
        "J-Mean": 0.519137, "F-Mean": 0.502523, "J&F": 0.51083})
    a, b = results["seqA"], results["seqB"]
    want = (a["J-Mean"] * 2 + b["J-Mean"] * 2) / 4
    assert abs(results["COMBINED_SEQ"]["J-Mean"] - want) < 1e-9


def test_seg2bmap_simple():
    m = np.zeros((6, 6), bool)
    m[2:5, 2:5] = True
    b = seg2bmap(m)
    # the boundary ring sits offset by 1/2 px towards the origin: a 4x4
    # ring at rows/cols 1..4 around the 3x3 square at [2:5, 2:5]
    assert b.sum() == 12
    assert b[1, 1] and b[1, 4] and b[4, 1] and b[4, 4]
    assert not b[3, 3] and not b[2, 2]   # interior is not boundary


def test_boundary_f_identical_masks():
    m = np.zeros((32, 32), bool)
    m[8:20, 10:25] = True
    assert boundary_f(m, m) == 1.0
    assert boundary_f(m, np.zeros_like(m)) == 0.0
    assert boundary_f(np.zeros_like(m), np.zeros_like(m)) == 1.0


def test_j_and_f_padding_for_missing_tracker():
    """Fewer tracker tracks than gt tracks: the extra gt rows score 0."""
    H = (12, 16)
    g1 = {t: np.pad(np.ones((4, 4), bool), ((2, 6), (2, 10)))
          for t in range(4)}
    g2 = {t: np.pad(np.ones((3, 3), bool), ((8, 1), (10, 3)))
          for t in range(4)}
    out = j_and_f_metrics([g1, g2], [dict(g1)], 4, H)
    assert out["num_gt_tracks"] == 2
    assert abs(out["J-Mean"] - 0.5) < 1e-9      # perfect + zero row
    out2 = combine_j_and_f([out, out])
    assert out2["num_gt_tracks"] == 4
    assert abs(out2["J-Mean"] - out["J-Mean"]) < 1e-12


def test_max_det_guard(tmp_path):
    ds = DAVISDataset(os.path.join(ROOT, "gt"),
                      os.path.join(ROOT, "trackers"), max_det=1)
    with pytest.raises(ValueError, match="exceeds"):
        ds.sequence_masks("minitracker", "seqA")
