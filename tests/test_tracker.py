"""Runtime tracker: identity persistence, birth/death thresholds, miss
tolerance; end-to-end with the HOTA metrics."""
import numpy as np

from fastervit_tpu.tracking.metrics import hota_metrics
from fastervit_tpu.tracking.tracker import RuntimeTracker, track_sequence


def _det(boxes, scores):
    return {"boxes": np.asarray(boxes, float),
            "scores": np.asarray(scores, float),
            "labels": np.zeros(len(boxes), int)}


def test_identity_persists_across_frames():
    frames = [_det([[0, 0, 10, 10]], [0.9]),
              _det([[1, 0, 11, 10]], [0.9]),
              _det([[2, 0, 12, 10]], [0.9])]
    out = track_sequence(frames)
    ids = [o["ids"][0] for o in out]
    assert ids[0] == ids[1] == ids[2]


def test_low_score_never_born():
    out = track_sequence([_det([[0, 0, 10, 10]], [0.5])] * 3)
    assert all(len(o["ids"]) == 0 for o in out)


def test_miss_tolerance_and_rebirth():
    tr = RuntimeTracker(miss_tolerance=2)
    frames = ([_det([[0, 0, 10, 10]], [0.9])]
              + [_det(np.zeros((0, 4)), [])] * 3
              + [_det([[0, 0, 10, 10]], [0.9])])
    out = track_sequence(frames, tr)
    assert len(out[0]["ids"]) == 1
    assert all(len(o["ids"]) == 0 for o in out[1:4])  # coasting not reported
    assert len(out[4]["ids"]) == 1
    # track died after 2 misses -> new identity on rebirth
    assert out[4]["ids"][0] != out[0]["ids"][0]


def test_two_targets_tracked_through_crossing():
    frames = []
    for t in range(5):
        frames.append(_det([[t * 5, 0, t * 5 + 10, 10],
                            [40 - t * 5, 0, 50 - t * 5, 10]], [0.9, 0.9]))
    out = track_sequence(frames)
    a0, b0 = out[0]["ids"]
    for o in out:
        assert set(o["ids"]) == {a0, b0}

    # score with HOTA against itself as gt -> perfect
    data = {
        "num_gt_ids": 2, "num_tracker_ids": 2,
        "gt_ids": [np.array([0, 1])] * 5,
        "tracker_ids": [np.asarray(o["ids"]) % 2 for o in out],
        "similarity_scores": [np.eye(2)] * 5,
    }
    assert hota_metrics(data)["HOTA"] > 0.99
