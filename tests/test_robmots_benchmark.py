"""RobMOTS combined-benchmark adapter over the committed mini benchmark
(tests/data/robmots_mini; built by tests/make_robmots_fixture.py).

Anchors were produced by the reference's vendored TrackEval (RobMOTS +
HOTA/CLEAR/Identity at threshold 0.5) on the identical fixture for both a
mask sub-benchmark (mots_challenge) and a box-gt sub-benchmark (tao); all
values match to 6 decimals.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from fastervit_tpu.tracking.robmots import (CLS_ID_TO_NAME,
                                            RobMOTSDataset)

ROOT = os.path.join(os.path.dirname(__file__), "data", "robmots_mini")


def _check(got, want):
    for k, v in want.items():
        assert abs(float(got[k]) - v) < 1e-5, (k, float(got[k]), v)


@pytest.fixture(scope="module")
def mots_results():
    ds = RobMOTSDataset(os.path.join(ROOT, "gt"),
                        os.path.join(ROOT, "trackers"), "mots_challenge")
    return ds.evaluate()["minitracker"]


@pytest.fixture(scope="module")
def tao_results():
    ds = RobMOTSDataset(os.path.join(ROOT, "gt"),
                        os.path.join(ROOT, "trackers"), "tao")
    return ds.evaluate()["minitracker"]


def test_mask_benchmark_oracle(mots_results):
    """Exercises: class-specific (101) ignore-region removal, the
    min(seq_size)/8 size filter, sequence-ignore-listed class (bicycle),
    and surviving FPs."""
    _check(mots_results["person"]["COMBINED_SEQ"], {
        "HOTA": 0.676357, "DetA": 0.511278, "AssA": 0.894737,
        "LocA": 0.871841, "MOTA": 0.25, "CLR_TP": 8, "CLR_FN": 0,
        "CLR_FP": 6, "IDF1": 0.727273})
    _check(mots_results["car"]["COMBINED_SEQ"], {
        "HOTA": 0.947368, "MOTA": 1.0, "CLR_TP": 8, "CLR_FP": 0})
    # every unmatched bicycle det is removed (seq ignore class list)
    _check(mots_results["bicycle"]["COMBINED_SEQ"], {
        "HOTA": 0.0, "MOTA": 0.0, "CLR_TP": 0, "CLR_FP": 0})


def test_all_class_oracle(mots_results):
    """'all' pools every det class-agnostically; unmatched dets of
    seq-ignore-listed or non-evaluated (dog) classes are removed."""
    _check(mots_results["all"]["COMBINED_SEQ"], {
        "HOTA": 0.790213, "DetA": 0.664753, "AssA": 0.947368,
        "MOTA": 0.625, "CLR_TP": 16, "CLR_FN": 0, "CLR_FP": 6,
        "IDF1": 0.842105})


def test_box_gt_benchmark_oracle(tao_results):
    """Box-gt benchmarks compare gt boxes vs tracker-mask bounding boxes;
    box-typed ignore regions are rasterized for the IoA removal."""
    _check(tao_results["person"]["COMBINED_SEQ"], {
        "HOTA": 0.774865, "DetA": 0.671053, "MOTA": 0.666667,
        "CLR_TP": 6, "CLR_FP": 2, "IDF1": 0.857143})
    _check(tao_results["car"]["COMBINED_SEQ"], {
        "HOTA": 0.631579, "MOTA": 0.666667, "CLR_TP": 4, "CLR_FN": 2})
    _check(tao_results["all"]["COMBINED_SEQ"], {
        "HOTA": 0.723194, "MOTA": 0.666667, "CLR_TP": 10, "CLR_FP": 2})


def test_seqmap_and_clsmap_parsing():
    ds = RobMOTSDataset(os.path.join(ROOT, "gt"),
                        os.path.join(ROOT, "trackers"), "mots_challenge")
    assert ds.seq_lengths == {"seqM": 8}
    assert ds.seq_sizes == {"seqM": (120, 240)}
    assert ds.seq_ignore_class_ids == {"seqM": [2]}
    assert list(ds.valid_class_ids) == [1, 2, 3]
    assert ds.class_list == ["person", "bicycle", "car", "all"]
    assert CLS_ID_TO_NAME[80] == "toothbrush" and CLS_ID_TO_NAME[1] == \
        "person"


def test_invalid_inputs(tmp_path):
    with pytest.raises(ValueError, match="invalid sub-benchmark"):
        RobMOTSDataset(str(tmp_path), str(tmp_path), "nope")
    with pytest.raises(FileNotFoundError):
        RobMOTSDataset(str(tmp_path), str(tmp_path), "tao")
    with pytest.raises(ValueError, match="invalid classes"):
        RobMOTSDataset(os.path.join(ROOT, "gt"),
                       os.path.join(ROOT, "trackers"), "tao",
                       classes=("zebra",))


def test_rle_to_bbox():
    from fastervit_tpu.utils.rle import rle_encode, rle_to_bbox
    m = np.zeros((10, 20), np.uint8)
    m[3:7, 5:12] = 1
    assert rle_to_bbox(rle_encode(m)).tolist() == [5, 3, 7, 4]
    assert rle_to_bbox(rle_encode(np.zeros((4, 4)))).tolist() == [0, 0,
                                                                  0, 0]
