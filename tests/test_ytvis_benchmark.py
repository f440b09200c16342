"""YouTube-VIS benchmark adapter over the committed mini benchmark
(tests/data/ytvis_mini; built by tests/make_mots_fixture.py make_ytvis).

Anchors were produced by the reference's vendored TrackEval (YouTubeVIS +
HOTA/CLEAR/Identity at threshold 0.5 + TrackMAP without time subsets) on
the identical fixture, with its pycocotools mask calls backed by this
repo's RLE codec; all values match to 6 decimals.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from fastervit_tpu.tracking.vis import YouTubeVISDataset

ROOT = os.path.join(os.path.dirname(__file__), "data", "ytvis_mini")


@pytest.fixture(scope="module")
def results():
    ds = YouTubeVISDataset(os.path.join(ROOT, "gt"),
                           os.path.join(ROOT, "trackers"))
    return ds.evaluate()["minitracker"]


def _check(got, want):
    for k, v in want.items():
        assert abs(float(got[k]) - v) < 1e-5, (k, float(got[k]), v)


def test_person_oracle(results):
    """Exercises: uncompressed-RLE gt normalization, the no-preprocessing
    rule (the crowd gt track scores as a regular track in HOTA/CLEAR), and
    the crowd-ignore rule in TrackMAP (the crowd-matched dt is neither TP
    nor FP; recall denominator excludes the crowd track)."""
    _check(results["person"]["vidA"], {
        "HOTA": 0.68331, "DetA": 0.570175, "AssA": 0.842105,
        "LocA": 0.805092, "MOTA": 0.7, "MOTP": 0.756244, "CLR_TP": 10,
        "CLR_FP": 3, "IDF1": 0.869565})
    _check(results["person"]["COMBINED_SEQ"], {
        "HOTA": 0.762417, "MOTA": 0.785714, "CLR_TP": 14, "CLR_FN": 0,
        "CLR_FP": 3, "IDF1": 0.903226,
        "TrackmAP": 0.750495, "TrackAP50": 1.0, "TrackAP75": 1.0})


def test_dog_oracle(results):
    """Exercises: None segmentation frames (track absent at t=0 and t=4)
    and per-class evaluation over all categories."""
    _check(results["dog"]["vidA"], {
        "HOTA": 0.894737, "MOTA": 1.0, "CLR_TP": 3, "CLR_FP": 0})
    _check(results["dog"]["vidB"], {"HOTA": 0.0, "MOTA": 0.0, "LocA": 1.0})
    _check(results["dog"]["COMBINED_SEQ"], {
        "TrackmAP": 0.8, "TrackAP50": 1.0, "TrackAP75": 1.0})


def test_layout_and_errors(tmp_path):
    ds = YouTubeVISDataset(os.path.join(ROOT, "gt"),
                           os.path.join(ROOT, "trackers"))
    assert ds.seq_list == ["vidA", "vidB"]
    assert ds.seq_lengths == {1: 5, 2: 4}
    assert ds.class_list == ["person", "dog"]   # all categories evaluated
    with pytest.raises(ValueError, match="invalid classes"):
        YouTubeVISDataset(os.path.join(ROOT, "gt"),
                          os.path.join(ROOT, "trackers"), classes=("cat",))
    with pytest.raises(FileNotFoundError):
        YouTubeVISDataset(str(tmp_path), str(tmp_path))


def test_polygon_segmentations_rejected():
    from fastervit_tpu.tracking.vis import _norm_segs
    with pytest.raises(ValueError, match="polygon"):
        _norm_segs({"segmentations": [[[0, 0, 10, 0, 10, 10]]]})


def test_mask_track_iou_3d():
    from fastervit_tpu.tracking.metrics import track_iou_3d_mask
    a = np.zeros((8, 8), bool)
    a[:4] = True
    b = np.zeros((8, 8), bool)
    b[2:6] = True
    # frame 0 overlaps 16/48; frame 1 only in dt -> union += 32
    dt = {0: a, 1: a}
    gt = {0: b}
    assert abs(track_iou_3d_mask(dt, gt) - 16 / 80) < 1e-12
