"""TrackEval-style benchmark dataset adapters: MOTChallenge / DanceTrack
folder layouts feeding the metric suite (tracking/metrics.py).

Reproduces the reference's vendored TrackEval dataset semantics
(TrackEval/trackeval/datasets/mot_challenge_2d_box.py):

  * folder layout  GT_FOLDER/<BENCHMARK>-<SPLIT>/<seq>/gt/gt.txt with
    per-sequence seqinfo.ini, sequence selection via
    GT_FOLDER/seqmaps/<BENCHMARK>-<SPLIT>.txt (mot_challenge_2d_box.py:131-171);
  * tracker layout TRACKERS_FOLDER/<BENCHMARK>-<SPLIT>/<tracker>/data/<seq>.txt
    (mot_challenge_2d_box.py:120-126);
  * MOT preprocessing (mot_challenge_2d_box.py:322-400): Hungarian-match
    tracker boxes to ALL gt boxes at IoU >= 0.5 and drop tracker dets matched
    to distractor classes; keep only zero_marked != 0, class == pedestrian gt;
  * per-sequence results plus a pooled COMBINED_SEQ row (TrackEval's
    combine_sequences — here via exact id-disjoint concatenation).

DanceTrack uses the same layout with no distractor classes and no
class-filtering (every annotation is class 1).
"""
from __future__ import annotations

import configparser
import csv
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np
from scipy.optimize import linear_sum_assignment

EPS = np.finfo(float).eps

# MOTChallenge class ids (mot_challenge_2d_box.py:196-199)
CLASS_IDS = {"pedestrian": 1, "person_on_vehicle": 2, "car": 3, "bicycle": 4,
             "motorbike": 5, "non_mot_vehicle": 6, "static_person": 7,
             "distractor": 8, "occluder": 9, "occluder_on_ground": 10,
             "occluder_full": 11, "reflection": 12, "crowd": 13}
_DISTRACTORS = ("person_on_vehicle", "static_person", "distractor",
                "reflection")


def load_mot_rows(path: str) -> Dict[int, np.ndarray]:
    """MOT text file -> {frame: (N, >=9) float rows}. Row layout:
    frame,id,x,y,w,h,conf,class,visibility — missing columns padded with 1
    (tracker files often stop after conf)."""
    per_frame = defaultdict(list)
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.replace(" ", ",").split(",")
            vals = [float(p) for p in parts if p != ""]
            vals = vals + [1.0] * max(0, 9 - len(vals))
            per_frame[int(vals[0])].append(vals[:9])
    return {fr: np.asarray(rows, float) for fr, rows in per_frame.items()}


def _iou_xywh(g: np.ndarray, d: np.ndarray) -> np.ndarray:
    """IoU between (G, 4) and (D, 4) xywh boxes."""
    if len(g) == 0 or len(d) == 0:
        return np.zeros((len(g), len(d)))
    gx0, gy0 = g[:, 0], g[:, 1]
    gx1, gy1 = g[:, 0] + g[:, 2], g[:, 1] + g[:, 3]
    dx0, dy0 = d[:, 0], d[:, 1]
    dx1, dy1 = d[:, 0] + d[:, 2], d[:, 1] + d[:, 3]
    ix = np.maximum(0, np.minimum(gx1[:, None], dx1[None]) -
                    np.maximum(gx0[:, None], dx0[None]))
    iy = np.maximum(0, np.minimum(gy1[:, None], dy1[None]) -
                    np.maximum(gy0[:, None], dy0[None]))
    inter = ix * iy
    union = (g[:, 2] * g[:, 3])[:, None] + (d[:, 2] * d[:, 3])[None] - inter
    return np.where(union > 0, inter / np.maximum(union, EPS), 0.0)


class MOTChallengeDataset:
    """MOTChallenge 2D-box benchmark adapter (TrackEval
    MotChallenge2DBox semantics)."""

    benchmark_default = "MOT17"
    distractor_names: Sequence[str] = _DISTRACTORS

    def __init__(self, gt_folder: str, trackers_folder: str,
                 benchmark: Optional[str] = None, split: str = "train",
                 seqmap_file: Optional[str] = None,
                 seq_info: Optional[Dict[str, Optional[int]]] = None,
                 trackers_to_eval: Optional[List[str]] = None,
                 tracker_sub_fol: str = "data", do_preproc: bool = True,
                 gt_loc_format: str = "{gt_folder}/{seq}/gt/gt.txt",
                 skip_split_fol: bool = False):
        self.benchmark = benchmark or self.benchmark_default
        self.split = split
        self.gt_set = f"{self.benchmark}-{split}"
        split_fol = "" if skip_split_fol else self.gt_set
        self.gt_fol = os.path.join(gt_folder, split_fol)
        self.tracker_fol = os.path.join(trackers_folder, split_fol)
        self.tracker_sub_fol = tracker_sub_fol
        self.do_preproc = do_preproc and self.benchmark != "MOT15"
        self.gt_loc_format = gt_loc_format
        distractors = list(self.distractor_names)
        if self.benchmark == "MOT20":
            distractors.append("non_mot_vehicle")
        self.distractor_classes = [CLASS_IDS[n] for n in distractors]

        self.seq_list, self.seq_lengths = self._get_seq_info(
            gt_folder, seqmap_file, seq_info)
        if not self.seq_list:
            raise ValueError("no sequences selected")
        for seq in self.seq_list:
            p = self.gt_loc_format.format(gt_folder=self.gt_fol, seq=seq)
            if not os.path.isfile(p):
                raise FileNotFoundError(f"GT file not found: {p}")

        if trackers_to_eval is None:
            self.tracker_list = sorted(os.listdir(self.tracker_fol))
        else:
            self.tracker_list = list(trackers_to_eval)
        for tracker in self.tracker_list:
            for seq in self.seq_list:
                p = os.path.join(self.tracker_fol, tracker,
                                 self.tracker_sub_fol, seq + ".txt")
                if not os.path.isfile(p):
                    raise FileNotFoundError(f"tracker file not found: {p}")

    def _read_seq_length(self, seq: str) -> int:
        ini = os.path.join(self.gt_fol, seq, "seqinfo.ini")
        if not os.path.isfile(ini):
            raise FileNotFoundError(f"seqinfo.ini not found for {seq}")
        cp = configparser.ConfigParser()
        cp.read(ini)
        return int(cp["Sequence"]["seqLength"])

    def _get_seq_info(self, gt_folder, seqmap_file, seq_info):
        if seq_info:
            lengths = {s: (n if n is not None else self._read_seq_length(s))
                       for s, n in seq_info.items()}
            return list(lengths), lengths
        if seqmap_file is None:
            seqmap_file = os.path.join(gt_folder, "seqmaps",
                                       self.gt_set + ".txt")
        if not os.path.isfile(seqmap_file):
            raise FileNotFoundError(f"no seqmap found: {seqmap_file}")
        seq_list, lengths = [], {}
        with open(seqmap_file) as fp:
            for i, row in enumerate(csv.reader(fp)):
                if i == 0 or not row or row[0] == "":
                    continue  # header line ("name") skipped like TrackEval
                seq_list.append(row[0])
                lengths[row[0]] = self._read_seq_length(row[0])
        return seq_list, lengths

    # ---- per-sequence evaluation data ------------------------------------
    def sequence_data(self, tracker: str, seq: str) -> Dict:
        """-> metric-suite data dict (contiguous ids, IoU similarity) after
        MOT preprocessing."""
        gt_rows = load_mot_rows(
            self.gt_loc_format.format(gt_folder=self.gt_fol, seq=seq))
        trk_rows = load_mot_rows(os.path.join(
            self.tracker_fol, tracker, self.tracker_sub_fol, seq + ".txt"))
        nt = self.seq_lengths[seq]
        extra = set(gt_rows) - set(range(1, nt + 1))
        extra |= set(trk_rows) - set(range(1, nt + 1))
        if extra:
            raise ValueError(f"invalid timesteps in {seq}: {sorted(extra)}")

        gt_idmap: Dict[int, int] = {}
        trk_idmap: Dict[int, int] = {}
        gt_ids, trk_ids, sims = [], [], []
        gt_dets_n = trk_dets_n = 0
        for t in range(1, nt + 1):
            g = gt_rows.get(t, np.zeros((0, 9)))
            d = trk_rows.get(t, np.zeros((0, 9)))
            sim = _iou_xywh(g[:, 2:6], d[:, 2:6])
            keep_trk = np.ones(len(d), bool)
            if self.do_preproc and len(g) and len(d):
                # drop tracker dets Hungarian-matched (IoU >= 0.5) to
                # distractor-class gt (mot_challenge_2d_box.py:359-381)
                ms = sim.copy()
                ms[ms < 0.5 - EPS] = 0
                r, c = linear_sum_assignment(-ms)
                ok = ms[r, c] > EPS
                r, c = r[ok], c[ok]
                is_distr = np.isin(g[r, 7].astype(int),
                                   self.distractor_classes)
                keep_trk[c[is_distr]] = False
            keep_gt = self._gt_keep_mask(g)
            g, d = g[keep_gt], d[keep_trk]
            sim = sim[keep_gt][:, keep_trk]
            for i in g[:, 1].astype(int):
                gt_idmap.setdefault(i, len(gt_idmap))
            for i in d[:, 1].astype(int):
                trk_idmap.setdefault(i, len(trk_idmap))
            gt_ids.append(np.asarray([gt_idmap[i] for i in
                                      g[:, 1].astype(int)], int))
            trk_ids.append(np.asarray([trk_idmap[i] for i in
                                       d[:, 1].astype(int)], int))
            sims.append(sim)
            gt_dets_n += len(g)
            trk_dets_n += len(d)
        return {"num_gt_ids": len(gt_idmap),
                "num_tracker_ids": len(trk_idmap),
                "num_gt_dets": gt_dets_n, "num_tracker_dets": trk_dets_n,
                "gt_ids": gt_ids, "tracker_ids": trk_ids,
                "similarity_scores": sims}

    def _gt_keep_mask(self, g: np.ndarray) -> np.ndarray:
        if len(g) == 0:
            return np.ones(0, bool)
        if self.do_preproc:
            # zero_marked (conf column) != 0 AND pedestrian class
            return (g[:, 6] != 0) & (g[:, 7].astype(int) == 1)
        return g[:, 6] != 0

    # ---- full benchmark evaluation ---------------------------------------
    def evaluate(self, trackers: Optional[List[str]] = None,
                 output_folder: Optional[str] = None) -> Dict:
        """-> {tracker: {seq | 'COMBINED_SEQ': {metric: value}}}. Writes a
        per-tracker detailed CSV when output_folder is given (the
        TrackEval *_detailed.csv analog)."""
        from fastervit_tpu.tracking.metrics import (clear_metrics,
                                                    hota_metrics,
                                                    identity_metrics)

        def all_metrics(data):
            out = {"Dets": data["num_gt_dets"],
                   "PredDets": data["num_tracker_dets"],
                   "IDs": data["num_gt_ids"],
                   "PredIDs": data["num_tracker_ids"]}
            out.update(clear_metrics(data))
            out.update(identity_metrics(data))
            out.update({k: v for k, v in hota_metrics(data).items()
                        if not k.endswith("_alpha")})
            return out

        results = {}
        for tracker in (trackers or self.tracker_list):
            per_seq = {}
            datas = []
            for seq in self.seq_list:
                data = self.sequence_data(tracker, seq)
                datas.append(data)
                per_seq[seq] = all_metrics(data)
            per_seq["COMBINED_SEQ"] = all_metrics(combine_sequence_data(datas))
            results[tracker] = per_seq
            if output_folder:
                os.makedirs(output_folder, exist_ok=True)
                write_detailed_csv(
                    os.path.join(output_folder, f"{tracker}_detailed.csv"),
                    per_seq)
        return results


class DanceTrackDataset(MOTChallengeDataset):
    """DanceTrack benchmark adapter: MOTChallenge layout, single class, no
    distractor preprocessing (every annotation is class 1)."""

    benchmark_default = "DanceTrack"
    distractor_names: Sequence[str] = ()

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("split", "val")
        kwargs.setdefault("do_preproc", False)
        super().__init__(*args, **kwargs)


def combine_sequence_data(seqs: List[Dict]) -> Dict:
    """Pool per-sequence data into one dict with disjoint id spaces —
    numerically identical to TrackEval's field-summing combine_sequences."""
    out = {"num_gt_ids": 0, "num_tracker_ids": 0, "num_gt_dets": 0,
           "num_tracker_dets": 0, "gt_ids": [], "tracker_ids": [],
           "similarity_scores": []}
    for d in seqs:
        go, po = out["num_gt_ids"], out["num_tracker_ids"]
        out["gt_ids"] += [ids + go for ids in d["gt_ids"]]
        out["tracker_ids"] += [ids + po for ids in d["tracker_ids"]]
        out["similarity_scores"] += list(d["similarity_scores"])
        out["num_gt_ids"] += d["num_gt_ids"]
        out["num_tracker_ids"] += d["num_tracker_ids"]
        out["num_gt_dets"] += d.get("num_gt_dets", 0)
        out["num_tracker_dets"] += d.get("num_tracker_dets", 0)
    return out


def write_detailed_csv(path: str, per_seq: Dict[str, Dict]) -> None:
    """Per-sequence metric table, one row per sequence + COMBINED_SEQ
    (TrackEval utils.write_detail format: 'seq' column then metric fields)."""
    rows = sorted(per_seq)
    fields = sorted(per_seq[rows[0]])
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["seq"] + fields)
        for seq in rows:
            w.writerow([seq] + [f"{float(per_seq[seq][k]):.6f}"
                                for k in fields])


def read_detailed_csv(path: str) -> Dict[str, Dict[str, float]]:
    with open(path, newline="") as f:
        r = csv.reader(f)
        header = next(r)
        return {row[0]: {k: float(v) for k, v in zip(header[1:], row[1:])}
                for row in r}
