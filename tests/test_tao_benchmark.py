"""TAO benchmark adapter over the committed mini benchmark
(tests/data/tao_mini; built by tests/make_tao_fixture.py).

Every anchor value below was produced by the reference's vendored TrackEval
(TAO dataset + HOTA/CLEAR/Identity at threshold 0.5 + TrackMAP) on the
identical fixture and matches to 6 decimals (TrackmAP = mean of AP_all,
TrackAP50/75 = AP_all[0]/AP_all[5]).
"""
import json
import os

import pytest

pytestmark = pytest.mark.smoke

from fastervit_tpu.tracking.tao import TAODataset

ROOT = os.path.join(os.path.dirname(__file__), "data", "tao_mini")


@pytest.fixture(scope="module")
def ds():
    return TAODataset(os.path.join(ROOT, "gt"),
                      os.path.join(ROOT, "trackers"))


@pytest.fixture(scope="module")
def results(ds):
    return ds.evaluate()["minitracker"]


def _check(got, want):
    for k, v in want.items():
        assert abs(float(got[k]) - v) < 1e-5, (k, float(got[k]), v)


def test_classes_and_sequences(ds):
    # dog (cat 3) has no gt anywhere -> not evaluated (federated protocol);
    # sequence names use the '/'->'-' mapping; timesteps count only
    # gt-annotated images (105 / 206 are unannotated)
    assert ds.class_list == ["person", "car"]
    assert ds.seq_list == ["val-seqX", "val-seqY"]
    assert ds.seq_lengths == {1: 5, 2: 5}


def test_person_oracle(results):
    """Exercises: non-timestep image dropping (HOTA side), spurious-FP
    retention, not-exhaustive removal of unmatched dets in seqY, the
    cross-video track-id clash (11 used in both videos)."""
    _check(results["person"]["val-seqX"], {
        "HOTA": 0.756191, "DetA": 0.639098, "AssA": 0.894737,
        "LocA": 0.877091, "MOTA": 0.6, "MOTP": 0.862631, "IDSW": 0,
        "CLR_TP": 5, "CLR_FN": 0, "CLR_FP": 2, "IDF1": 0.833333})
    _check(results["person"]["val-seqY"], {
        "HOTA": 0.947368, "MOTA": 1.0, "CLR_TP": 5, "CLR_FP": 0})
    _check(results["person"]["COMBINED_SEQ"], {
        "HOTA": 0.845323, "DetA": 0.761094, "AssA": 0.947368,
        "MOTA": 0.8, "IDF1": 0.909091,
        # TrackMAP keeps the detection on the unannotated image 105 in the
        # dt track (3D IoU 0.727 < 0.75 -> the seqX track misses at AP75)
        # and ignores only UNMATCHED dets of the not-exhaustive seqY class
        "TrackmAP": 0.600990, "TrackAP50": 1.0, "TrackAP75": 0.252475})


def test_car_oracle(results):
    """Exercises: category merging (gt + tracker annotate the merged
    'sedan' id), removal at gt-empty timesteps, negative-category
    retention in seqY, missing tracker video_id fill."""
    _check(results["car"]["val-seqX"], {
        "HOTA": 0.894737, "MOTA": 1.0, "CLR_TP": 4, "CLR_FN": 0,
        "CLR_FP": 0})   # the frame-5 car det was removed (no gt, not neg)
    _check(results["car"]["val-seqY"], {
        "HOTA": 0.0, "MOTA": 0.0, "CLR_FP": 1})  # neg class: det kept
    _check(results["car"]["COMBINED_SEQ"], {
        "HOTA": 0.800277, "DetA": 0.715789, "AssA": 0.894737,
        "MOTA": 0.75, "IDF1": 0.888889,
        "TrackmAP": 0.8, "TrackAP50": 1.0, "TrackAP75": 1.0})


def test_track_id_disambiguation():
    anns = [{"track_id": 7, "video_id": 1},
            {"track_id": 7, "video_id": 2},
            {"track_id": 9, "video_id": 2}]
    assert TAODataset._unique_track_ids(anns) == 1
    ids = {(a["track_id"], a["video_id"]) for a in anns}
    assert len({t for t, _ in ids}) == 3     # 7 split into two fresh ids


def test_max_detections_cap(tmp_path, ds):
    capped = ds._limit_dets([{"image_id": 1, "score": s / 10.0, "id": s}
                             for s in range(5)])
    assert len(capped) == 5                  # under the default 300 cap
    ds2 = TAODataset.__new__(TAODataset)
    ds2.max_detections = 2
    capped = ds2._limit_dets([{"image_id": 1, "score": s / 10.0, "id": s}
                              for s in range(5)])
    assert sorted(a["score"] for a in capped) == [0.3, 0.4]


def test_invalid_class_raises():
    with pytest.raises(ValueError):
        TAODataset(os.path.join(ROOT, "gt"), os.path.join(ROOT, "trackers"),
                   classes=("dog",))


def test_detailed_csv(tmp_path, ds, results):
    from fastervit_tpu.tracking.benchmarks import read_detailed_csv
    ds.evaluate(output_folder=str(tmp_path))
    got = read_detailed_csv(str(tmp_path / "minitracker_person_detailed.csv"))
    assert set(got) == {"val-seqX", "val-seqY", "COMBINED_SEQ"}
    assert abs(got["COMBINED_SEQ"]["HOTA"] - 0.845323) < 1e-5
