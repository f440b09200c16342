"""MOTChallenge/DanceTrack benchmark adapters: golden-file regression over a
committed mini benchmark (the reference's TrackEval pattern,
TrackEval/tests/test_all_quick.py:24-60 — evaluate a tracker over the real
folder layout and compare per-sequence values to a committed CSV).

The golden CSV was verified value-for-value (6 decimals) against the
reference's own vendored TrackEval run on the identical fixture
(MotChallenge2DBox + HOTA/CLEAR/Identity, DO_PREPROC on).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from fastervit_tpu.tracking.benchmarks import (DanceTrackDataset,
                                               MOTChallengeDataset,
                                               combine_sequence_data,
                                               read_detailed_csv)

ROOT = os.path.join(os.path.dirname(__file__), "data", "mot_mini")

# fields verified exactly against the reference TrackEval oracle
ORACLE_FIELDS = ["HOTA", "DetA", "AssA", "LocA", "MOTA", "MOTP", "IDSW",
                 "IDF1", "MT", "PT", "ML", "Frag", "CLR_TP", "CLR_FN",
                 "CLR_FP", "IDTP", "IDFN", "IDFP"]


@pytest.fixture(scope="module")
def mini_results():
    ds = MOTChallengeDataset(
        os.path.join(ROOT, "gt", "mot_challenge"),
        os.path.join(ROOT, "trackers", "mot_challenge"),
        benchmark="MINI", split="train")
    return ds.evaluate()["minitracker"]


def test_golden_regression(mini_results):
    golden = read_detailed_csv(
        os.path.join(ROOT, "golden_mini_detailed.csv"))
    assert set(golden) == {"seq01", "seq02", "COMBINED_SEQ"}
    checked = 0
    for seq, want in golden.items():
        got = mini_results[seq]
        for field, val in want.items():
            assert abs(float(got[field]) - val) < 1e-4, (seq, field)
            checked += 1
    assert checked >= 3 * len(ORACLE_FIELDS)


def test_oracle_anchor_values(mini_results):
    """Values independently produced by the reference's vendored TrackEval
    on this exact fixture (MotChallenge2DBox, DO_PREPROC=True)."""
    c = mini_results["COMBINED_SEQ"]
    assert abs(c["HOTA"] - 0.613790) < 1e-5
    assert abs(c["DetA"] - 0.618044) < 1e-5
    assert abs(c["AssA"] - 0.611109) < 1e-5
    assert abs(c["LocA"] - 0.836719) < 1e-5
    assert abs(c["MOTA"] - 0.721519) < 1e-5
    assert abs(c["MOTP"] - 0.811865) < 1e-5
    assert abs(c["IDF1"] - 0.705128) < 1e-5
    assert c["IDSW"] == 2 and c["Frag"] == 0 and c["MT"] == 4


def test_preproc_removes_distractor_matches():
    """seq01 has class-8 (distractor) gt rows that the tracker follows for
    frames 6-9; preprocessing must remove those tracker dets and all
    non-pedestrian gt."""
    kw = dict(benchmark="MINI", split="train")
    base = os.path.join(ROOT, "gt", "mot_challenge")
    trk = os.path.join(ROOT, "trackers", "mot_challenge")
    on = MOTChallengeDataset(base, trk, **kw).sequence_data(
        "minitracker", "seq01")
    off = MOTChallengeDataset(base, trk, do_preproc=False,
                              **kw).sequence_data("minitracker", "seq01")
    assert on["num_tracker_dets"] < off["num_tracker_dets"]
    assert on["num_gt_dets"] < off["num_gt_dets"]   # distractor gt removed
    # zero-marked gt row is dropped in both modes
    assert off["num_gt_ids"] == 4                   # 3 tracks + distractor


def test_dancetrack_adapter_same_layout(tmp_path):
    """DanceTrack adapter reads the same folder layout (no distractors, no
    class filter) via SEQ_INFO-style direct sequence selection."""
    ds = DanceTrackDataset(
        os.path.join(ROOT, "gt", "mot_challenge"),
        os.path.join(ROOT, "trackers", "mot_challenge"),
        benchmark="MINI", split="train",
        seq_info={"seq01": None, "seq02": 15})
    assert ds.seq_lengths == {"seq01": 20, "seq02": 15}
    res = ds.evaluate(output_folder=str(tmp_path))["minitracker"]
    assert 0.0 < res["COMBINED_SEQ"]["HOTA"] < 1.0
    written = read_detailed_csv(str(tmp_path / "minitracker_detailed.csv"))
    assert abs(written["seq01"]["HOTA"] - res["seq01"]["HOTA"]) < 1e-6
    # without preproc the distractor-following dets count as plain FPs
    mot = MOTChallengeDataset(
        os.path.join(ROOT, "gt", "mot_challenge"),
        os.path.join(ROOT, "trackers", "mot_challenge"),
        benchmark="MINI", split="train").evaluate()["minitracker"]
    assert res["seq01"]["CLR_FP"] >= mot["seq01"]["CLR_FP"]


def test_combine_is_id_disjoint_pool():
    rng = np.random.RandomState(0)
    seqs = []
    for k in range(2):
        seqs.append({"num_gt_ids": 2, "num_tracker_ids": 2,
                     "num_gt_dets": 4, "num_tracker_dets": 4,
                     "gt_ids": [np.array([0, 1])] * 2,
                     "tracker_ids": [np.array([0, 1])] * 2,
                     "similarity_scores": [rng.rand(2, 2)] * 2})
    c = combine_sequence_data(seqs)
    assert c["num_gt_ids"] == 4 and c["num_tracker_ids"] == 4
    assert len(c["gt_ids"]) == 4
    assert c["gt_ids"][2].min() == 2      # second sequence offset


def test_missing_files_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        MOTChallengeDataset(str(tmp_path), str(tmp_path), benchmark="MINI",
                            split="train", seq_info={"nope": 5})
