"""Tracking: run a detector as a tracker and evaluate with HOTA."""
import numpy as np

from fastervit_tpu.tracking.metrics import evaluate_sequences
from fastervit_tpu.tracking.mot_data import build_eval_data, write_mot_file
from fastervit_tpu.tracking.tracker import RuntimeTracker, track_sequence

# per-frame detections (e.g. from the DINO detector's postprocess)
frames = [{"boxes": np.array([[10. + 3 * t, 10, 50 + 3 * t, 90]]),
           "scores": np.array([0.9]), "labels": np.array([0])}
          for t in range(10)]
results = track_sequence(frames, RuntimeTracker(score_thresh=0.7))
write_mot_file("/tmp/track_results.txt", results)
print("frames tracked:", len(results), "ids:", results[-1]["ids"])
