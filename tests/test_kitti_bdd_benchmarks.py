"""KITTI 2D-box / BDD100K benchmark adapters over committed mini benchmarks
(tests/data/kitti_mini, tests/data/bdd_mini; built by
tests/make_kitti_bdd_fixture.py).

Every anchor value below was produced by the reference's vendored TrackEval
run on the identical fixtures (Kitti2DBox / BDD100K datasets + HOTA/CLEAR/
Identity at threshold 0.5) and matches to 6 decimals.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from fastervit_tpu.tracking.benchmarks import (BDD100KDataset,
                                               HeadTrackingDataset,
                                               KITTI2DBoxDataset,
                                               class_averaged)

DATA = os.path.join(os.path.dirname(__file__), "data")
HT = os.path.join(DATA, "ht_mini")
KITTI = os.path.join(DATA, "kitti_mini")
BDD = os.path.join(DATA, "bdd_mini")


@pytest.fixture(scope="module")
def kitti_results():
    ds = KITTI2DBoxDataset(os.path.join(KITTI, "gt"),
                           os.path.join(KITTI, "trackers"))
    return ds.evaluate()["minitracker"]


@pytest.fixture(scope="module")
def bdd_results():
    ds = BDD100KDataset(os.path.join(BDD, "gt"),
                        os.path.join(BDD, "trackers"),
                        classes=("car", "pedestrian", "rider"))
    return ds.evaluate()["minitracker"]


def _check(got, want):
    for k, v in want.items():
        assert abs(float(got[k]) - v) < 1e-5, (k, float(got[k]), v)


def test_kitti_car_oracle(kitti_results):
    """Exercises: van-distractor removal, truncation/occlusion gating,
    dontcare-region and min-height unmatched removal, one ID switch."""
    _check(kitti_results["car"]["COMBINED_SEQ"], {
        "HOTA": 0.827349, "DetA": 0.833929, "AssA": 0.830019,
        "LocA": 0.931796, "MOTA": 0.866667, "MOTP": 0.927941, "IDSW": 1,
        "CLR_TP": 45, "CLR_FN": 0, "CLR_FP": 5, "MT": 3, "PT": 0, "ML": 0,
        "Frag": 0, "IDF1": 0.842105, "IDTP": 40, "IDFN": 5, "IDFP": 10})
    _check(kitti_results["car"]["0000"], {
        "HOTA": 0.792263, "MOTA": 0.828571, "CLR_TP": 35, "CLR_FP": 5,
        "IDSW": 1})
    _check(kitti_results["car"]["0001"], {
        "HOTA": 0.947368, "MOTA": 1.0, "CLR_TP": 10, "CLR_FP": 0})


def test_kitti_pedestrian_oracle(kitti_results):
    """Exercises: person-sitting distractor removal for the ped class."""
    _check(kitti_results["pedestrian"]["COMBINED_SEQ"], {
        "HOTA": 0.820445, "DetA": 0.789474, "AssA": 0.852632,
        "LocA": 0.917686, "MOTA": 0.833333, "MOTP": 0.913113, "IDSW": 0,
        "CLR_TP": 25, "CLR_FN": 5, "CLR_FP": 0, "MT": 1, "PT": 1,
        "IDF1": 0.909091})
    _check(kitti_results["pedestrian"]["0001"], {
        "HOTA": 0.473684, "MOTA": 0.5, "CLR_TP": 5, "CLR_FN": 5})


def test_kitti_preproc_branches():
    ds = KITTI2DBoxDataset(os.path.join(KITTI, "gt"),
                           os.path.join(KITTI, "trackers"))
    d = ds.sequence_data("minitracker", "0000", "car")
    # survivors: gt car1 + car2 (van/truncated/occluded gt excluded)
    assert d["num_gt_ids"] == 2 and d["num_gt_dets"] == 35
    # tracker survivors: 11, 12, 13 (id switch pair) + FP id 18;
    # van-follower 14, truncated-follower 15, dontcare 16, tiny 17 removed
    assert d["num_tracker_ids"] == 4 and d["num_tracker_dets"] == 40
    p = ds.sequence_data("minitracker", "0000", "pedestrian")
    assert p["num_gt_ids"] == 1          # person-sitting gt excluded
    assert p["num_tracker_ids"] == 1     # its follower removed


def test_bdd_oracle(bdd_results):
    """Exercises: crowd + distractor-class ignore regions, per-class eval,
    cross-sequence combine, empty class-sequence pairs."""
    _check(bdd_results["car"]["COMBINED_SEQ"], {
        "HOTA": 0.771102, "DetA": 0.769737, "AssA": 0.772470,
        "LocA": 0.934240, "MOTA": 0.692308, "MOTP": 0.930587, "IDSW": 1,
        "CLR_TP": 13, "CLR_FN": 0, "CLR_FP": 3, "MT": 2,
        "IDF1": 0.758621, "IDTP": 11, "IDFN": 2, "IDFP": 5})
    _check(bdd_results["car"]["seqB"], {
        "HOTA": 0.683157, "AssA": 0.492632, "IDSW": 1, "IDF1": 0.6})
    _check(bdd_results["pedestrian"]["COMBINED_SEQ"], {
        "HOTA": 0.710526, "MOTA": 0.75, "CLR_TP": 6, "CLR_FN": 2,
        "CLR_FP": 0})   # crowd-region det removed every frame
    _check(bdd_results["rider"]["COMBINED_SEQ"], {
        "HOTA": 0.0, "MOTA": 0.0, "CLR_FN": 8, "ML": 1})


def test_bdd_empty_sequence_convention(bdd_results):
    """A class absent from both gt and tracker in a sequence scores zeros
    (TrackEval's empty-sequence convention: MOTA 0, LocA 1)."""
    m = bdd_results["pedestrian"]["seqB"]
    assert m["MOTA"] == 0.0 and m["HOTA"] == 0.0 and m["LocA"] == 1.0


def test_bdd_class_averaged_and_super_categories(bdd_results):
    avg = class_averaged(bdd_results)
    want = np.mean([bdd_results[c]["COMBINED_SEQ"]["HOTA"]
                    for c in ("car", "pedestrian", "rider")])
    assert abs(avg["HOTA"] - want) < 1e-9
    human = class_averaged(
        bdd_results, classes=BDD100KDataset.SUPER_CATEGORIES["HUMAN"])
    want = np.mean([bdd_results[c]["COMBINED_SEQ"]["HOTA"]
                    for c in ("pedestrian", "rider")])
    assert abs(human["HOTA"] - want) < 1e-9


def test_kitti_detailed_csv(tmp_path, kitti_results):
    from fastervit_tpu.tracking.benchmarks import read_detailed_csv
    ds = KITTI2DBoxDataset(os.path.join(KITTI, "gt"),
                           os.path.join(KITTI, "trackers"))
    ds.evaluate(output_folder=str(tmp_path))
    got = read_detailed_csv(str(tmp_path / "minitracker_car_detailed.csv"))
    assert abs(got["COMBINED_SEQ"]["HOTA"]
               - kitti_results["car"]["COMBINED_SEQ"]["HOTA"]) < 1e-6
    assert set(got) == {"0000", "0001", "COMBINED_SEQ"}


def test_head_tracking_oracle():
    """Exercises: 0.4 matching threshold, invisible-gt removal, the
    static-class distractor, and the reference's dead zero-confidence
    condition (dets matched to zero-marked gt stay as FPs: 5 of the 8)."""
    ds = HeadTrackingDataset(os.path.join(HT, "gt", "mot_challenge"),
                             os.path.join(HT, "trackers", "mot_challenge"),
                             split="train")
    res = ds.evaluate()["minitracker"]
    _check(res["COMBINED_SEQ"], {
        "HOTA": 0.700674, "DetA": 0.582996, "AssA": 0.842105,
        "LocA": 0.865058, "MOTA": 0.555556, "MOTP": 0.839757, "IDSW": 0,
        "CLR_TP": 18, "CLR_FN": 0, "CLR_FP": 8, "MT": 2, "ML": 0,
        "IDF1": 0.818182})
    d = ds.sequence_data("minitracker", "HT-mini-01")
    assert d["num_gt_ids"] == 2           # static + zero-marked excluded
    assert d["num_tracker_ids"] == 4      # 31, 32, 34, 35 (33 removed)


def test_head_tracking_validations():
    ds = HeadTrackingDataset(os.path.join(HT, "gt", "mot_challenge"),
                             os.path.join(HT, "trackers", "mot_challenge"),
                             split="train")
    import numpy as np
    from fastervit_tpu.tracking import benchmarks as B
    rows = {1: np.array([[1, 1, 0, 0, 5, 5, 1, 7, 1]], float)}
    orig = B.load_mot_rows
    try:
        B.load_mot_rows = lambda path: rows   # gt class 7 is invalid for HT
        with pytest.raises(ValueError, match="invalid gt classes"):
            ds.sequence_data("minitracker", "HT-mini-01")
    finally:
        B.load_mot_rows = orig


def test_kitti_invalid_class_and_missing_files(tmp_path):
    with pytest.raises(ValueError):
        KITTI2DBoxDataset(os.path.join(KITTI, "gt"),
                          os.path.join(KITTI, "trackers"),
                          classes=("cyclist",))
    with pytest.raises(FileNotFoundError):
        KITTI2DBoxDataset(str(tmp_path), str(tmp_path))
    with pytest.raises(FileNotFoundError):
        BDD100KDataset(str(tmp_path), str(tmp_path))
