"""Tracking-metric tests with hand-computed expectations (the reference's
TrackEval tests/test_metrics.py pattern: tiny similarity matrices, exact
values)."""
import numpy as np

from fastervit_tpu.tracking.metrics import (clear_metrics, evaluate_sequences,
                                            hota_metrics, identity_metrics)
import pytest

pytestmark = pytest.mark.smoke


def _seq_perfect(T=5, n=2):
    """n tracks perfectly followed for T frames."""
    return {
        "num_gt_ids": n, "num_tracker_ids": n,
        "gt_ids": [np.arange(n)] * T,
        "tracker_ids": [np.arange(n)] * T,
        "similarity_scores": [np.eye(n)] * T,
    }


def test_perfect_tracking_all_ones():
    d = _seq_perfect()
    c = clear_metrics(d)
    assert c["MOTA"] == 1.0 and c["MOTP"] == 1.0 and c["IDSW"] == 0
    i = identity_metrics(d)
    assert i["IDF1"] == 1.0 and i["IDFP"] == 0 and i["IDFN"] == 0
    h = hota_metrics(d)
    assert abs(h["HOTA"] - 1.0) < 1e-9
    assert abs(h["DetA"] - 1.0) < 1e-9 and abs(h["AssA"] - 1.0) < 1e-9


def test_id_switch_counted():
    """One gt track followed by tracker id 0 for 2 frames then id 1 for 2:
    MOTA = 1 - 1/4 (one switch), IDF1 from best global match = id0 or id1
    (2 of 4 frames): IDTP=2, IDFN=2, IDFP=2 -> IDF1 = 2*2/(4+4) = 0.5."""
    d = {
        "num_gt_ids": 1, "num_tracker_ids": 2,
        "gt_ids": [np.array([0])] * 4,
        "tracker_ids": [np.array([0]), np.array([0]),
                        np.array([1]), np.array([1])],
        "similarity_scores": [np.array([[1.0]])] * 4,
    }
    c = clear_metrics(d)
    assert c["IDSW"] == 1 and c["CLR_TP"] == 4 and c["CLR_FP"] == 0
    assert abs(c["MOTA"] - 0.75) < 1e-9
    i = identity_metrics(d)
    assert i["IDTP"] == 2 and i["IDFN"] == 2 and i["IDFP"] == 2
    assert abs(i["IDF1"] - 0.5) < 1e-9
    h = hota_metrics(d)
    # DetA = 4/4 = 1 at all alphas; AssA: each TP's pair has A = 2/(4+2-2) = 0.5
    assert abs(h["DetA"] - 1.0) < 1e-9
    assert abs(h["AssA"] - 0.5) < 1e-9
    assert abs(h["HOTA"] - np.sqrt(0.5)) < 1e-9


def test_missed_and_false_detections():
    """2 gt tracks, tracker only follows one and adds one spurious detection
    each frame: per frame TP=1, FN=1, FP=1 over 3 frames.
    MOTA = 1 - (3+3)/6 = 0."""
    T = 3
    d = {
        "num_gt_ids": 2, "num_tracker_ids": 2,
        "gt_ids": [np.arange(2)] * T,
        "tracker_ids": [np.arange(2)] * T,
        "similarity_scores": [np.array([[1.0, 0.0], [0.0, 0.0]])] * T,
    }
    c = clear_metrics(d)
    assert c["CLR_TP"] == 3 and c["CLR_FN"] == 3 and c["CLR_FP"] == 3
    assert abs(c["MOTA"] - 0.0) < 1e-9
    i = identity_metrics(d)
    # best match: gt0<->trk0 (3 TP); gt1 and trk1 unmatched (3 FN, 3 FP)
    assert i["IDTP"] == 3 and i["IDFN"] == 3 and i["IDFP"] == 3
    assert abs(i["IDF1"] - 0.5) < 1e-9
    # HOTA: DetA = 3/9 = 1/3; AssA = 1 for the matched pair
    h = hota_metrics(d)
    assert abs(h["DetA"] - 1 / 3) < 1e-9
    assert abs(h["AssA"] - 1.0) < 1e-9
    assert abs(h["HOTA"] - np.sqrt(1 / 3)) < 1e-9


def test_threshold_rejects_low_iou():
    d = {
        "num_gt_ids": 1, "num_tracker_ids": 1,
        "gt_ids": [np.array([0])] * 2,
        "tracker_ids": [np.array([0])] * 2,
        "similarity_scores": [np.array([[0.4]])] * 2,
    }
    c = clear_metrics(d, threshold=0.5)
    assert c["CLR_TP"] == 0 and c["CLR_FN"] == 2 and c["CLR_FP"] == 2
    h = hota_metrics(d)
    # matched at alphas <= 0.4: 8 of 19 alphas (0.05..0.40)
    assert (h["DetA_alpha"] > 0).sum() == 8


def test_evaluate_sequences_mean():
    out = evaluate_sequences([_seq_perfect(), _seq_perfect(T=3, n=1)])
    assert out["HOTA"] == 1.0 and out["MOTA"] == 1.0 and out["IDF1"] == 1.0


def test_mt_ml_frag():
    """gt0 tracked 4/4 frames (MT); gt1 tracked 1/4 (ML); gt2 matched,
    dropped mid-sequence, re-matched -> 1 fragmentation."""
    T = 4
    sims = []
    for t in range(T):
        s = np.zeros((3, 3))
        s[0, 0] = 1.0                        # gt0 always tracked
        if t == 0:
            s[1, 1] = 1.0                    # gt1 only frame 0
        if t in (0, 2, 3):
            s[2, 2] = 1.0                    # gt2 missing frame 1 -> frag
        sims.append(s)
    d = {"num_gt_ids": 3, "num_tracker_ids": 3,
         "gt_ids": [np.arange(3)] * T,
         "tracker_ids": [np.arange(3)] * T,
         "similarity_scores": sims}
    c = clear_metrics(d)
    assert c["MT"] == 1          # gt0 (4/4); gt2 at 3/4 = 0.75 is not > 0.8
    assert c["PT"] == 2          # gt1 (0.25) and gt2 (0.75) in [0.2, 0.8]
    assert c["ML"] == 0
    # TrackEval clear.py:107,122 counts RE-acquisitions: gt2 is re-acquired
    # after the frame-1 gap (1 frag); gt1 is lost but never re-acquired (0)
    assert c["Frag"] == 1


def test_vace_hand_computed():
    """VACE values against hand-computed expectations (TrackEval
    tests/test_metrics.py style)."""
    from fastervit_tpu.tracking.metrics import vace_metrics

    one = np.ones((1, 1))
    # gt track 0 on 3 frames; tracker follows for 2 then disappears
    d = {"num_gt_ids": 1, "num_tracker_ids": 1,
         "gt_ids": [np.array([0])] * 3,
         "tracker_ids": [np.array([0]), np.array([0]), np.array([], int)],
         "similarity_scores": [one, one, np.zeros((1, 0))]}
    m = vace_metrics(d)
    assert abs(m["STDA"] - 2 / 3) < 1e-9       # 2 overlap / 3 union frames
    assert abs(m["ATA"] - 2 / 3) < 1e-9        # / (0.5 * (1 + 1))
    assert abs(m["SFDA"] - 2 / 3) < 1e-9       # 2 perfect frames / 3 non-empty

    # identity split: second tracker id covers the last frame
    d2 = {"num_gt_ids": 1, "num_tracker_ids": 2,
          "gt_ids": [np.array([0])] * 3,
          "tracker_ids": [np.array([0]), np.array([0]), np.array([1])],
          "similarity_scores": [one, one, one]}
    m2 = vace_metrics(d2)
    assert abs(m2["STDA"] - 2 / 3) < 1e-9      # best single match: trk 0
    assert abs(m2["ATA"] - (2 / 3) / 1.5) < 1e-9
    assert abs(m2["SFDA"] - 1.0) < 1e-9        # every frame matched 1:1


def test_track_map_hand_computed():
    from fastervit_tpu.tracking.metrics import track_iou_3d, track_map_metrics

    box = lambda x0: np.asarray([x0, 0.0, x0 + 10.0, 10.0])
    # 3D IoU: same box for 2 of 3 frames, absent 3rd -> 200/300
    g = {0: box(0), 1: box(0), 2: box(0)}
    d = {0: box(0), 1: box(0)}
    assert abs(track_iou_3d(d, g) - 2 / 3) < 1e-9

    # two gt tracks; det 1 perfect at score .9, det 2 misses at score .8
    seq = {"gt_tracks": [{0: box(0)}, {0: box(50)}],
           "dt_tracks": [{0: box(0)}, {0: box(200)}],
           "dt_scores": [0.9, 0.8]}
    m = track_map_metrics([seq])
    # recall .5 at precision 1, then FP: 101-pt AP = 51/101
    assert abs(m["TrackAP50"] - 51 / 101) < 1e-6
    assert abs(m["TrackmAP"] - 51 / 101) < 1e-6

    # perfect tracker
    seq2 = {"gt_tracks": [{0: box(0)}, {0: box(50)}],
            "dt_tracks": [{0: box(0)}, {0: box(50)}],
            "dt_scores": [0.9, 0.8]}
    m2 = track_map_metrics([seq2])
    assert abs(m2["TrackmAP"] - 1.0) < 1e-9
