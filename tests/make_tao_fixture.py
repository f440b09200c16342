"""Generate the committed mini TAO benchmark (tests/data/tao_mini).

Exercises the federated-evaluation branches of the TAO semantics
(trackeval/datasets/tao.py): category merging (`merged` tag), negative and
not-exhaustively-labeled category handling, gt-annotated-images-only
timesteps, tracker track-id disambiguation across videos, and missing
tracker video_ids.

Run from the repo root: python tests/make_tao_fixture.py
"""
import json
import os

ROOT = os.path.join(os.path.dirname(__file__), "data", "tao_mini")


def ann(aid, img, vid, tid, cat, box, score=None):
    d = {"id": aid, "image_id": img, "video_id": vid, "track_id": tid,
         "category_id": cat, "bbox": [float(b) for b in box]}
    if score is not None:
        d["score"] = score
    return d


def main():
    videos = [
        {"id": 1, "name": "val/seqX", "neg_category_ids": [3],
         "not_exhaustive_category_ids": []},
        # car (2) negative here: unmatched car dets are kept;
        # person (1) not exhaustively labeled: unmatched person dets dropped
        {"id": 2, "name": "val/seqY", "neg_category_ids": [2],
         "not_exhaustive_category_ids": [1]},
    ]
    images = [{"id": 100 + k, "video_id": 1, "frame_index": k - 1,
               "file_name": f"x{k}.jpg"} for k in range(1, 7)]
    images += [{"id": 200 + k, "video_id": 2, "frame_index": k - 1,
                "file_name": f"y{k}.jpg"} for k in range(1, 7)]
    categories = [{"id": 1, "name": "person"},
                  {"id": 2, "name": "car", "merged": [{"id": 4}]},
                  {"id": 3, "name": "dog"},
                  {"id": 4, "name": "sedan"}]
    anns, aid = [], 0
    # person track 1 in seqX: frames 0-3 and 5 (image 105 has NO gt at all,
    # so it is not a timestep; tracker dets there must be ignored)
    for k in (1, 2, 3, 4, 6):
        aid += 1
        anns.append(ann(aid, 100 + k, 1, 1, 1,
                        (100 + 5 * k, 100, 40, 80)))
    # car track 2 in seqX, annotated as the merged category 4 (sedan)
    for k in (1, 2, 3, 4):
        aid += 1
        anns.append(ann(aid, 100 + k, 1, 2, 4,
                        (300 + 10 * k, 200, 100, 60)))
    # person track 3 in seqY: frames 0-4 (image 206 unannotated)
    for k in (1, 2, 3, 4, 5):
        aid += 1
        anns.append(ann(aid, 200 + k, 2, 3, 1, (150, 120, 35, 90)))
    tracks = [{"id": 1, "category_id": 1, "video_id": 1},
              {"id": 2, "category_id": 4, "video_id": 1},
              {"id": 3, "category_id": 1, "video_id": 2}]
    gt = {"videos": videos, "images": images, "annotations": anns,
          "tracks": tracks, "categories": categories,
          "info": {"description": "mini TAO fixture"}}

    res, rid = [], 1000
    # seqX person follower (track 11), incl. a det on the non-timestep
    # image 105 that must be ignored
    for k in (1, 2, 3, 4, 5, 6):
        rid += 1
        res.append(ann(rid, 100 + k, 1, 11, 1,
                       (102 + 5 * k, 102, 40, 80), score=0.9))
    # seqX dog dets (track 12): dog is negative in seqX -> unmatched kept,
    # but dog has no gt anywhere so the class is not evaluated at all
    for k in (1, 2, 3):
        rid += 1
        res.append(ann(rid, 100 + k, 1, 12, 3, (500, 300, 50, 40),
                       score=0.8))
    # seqX car follower (track 13) predicted as merged cat 4; also missing
    # video_id to exercise the image->video fill
    for k in (1, 2, 3, 4):
        rid += 1
        a = ann(rid, 100 + k, 1, 13, 4,
                (303 + 10 * k, 203, 100, 60), score=0.7)
        del a["video_id"]
        res.append(a)
    # seqX spurious person dets while person gt exists: kept as FPs
    for k in (1, 2):
        rid += 1
        res.append(ann(rid, 100 + k, 1, 14, 1, (700, 100, 40, 80),
                       score=0.65))
    # seqX car det at frame 5 (no car gt at that timestep, car not
    # negative in seqX): removed
    rid += 1
    res.append(ann(rid, 106, 1, 15, 2, (320, 210, 100, 60), score=0.6))
    # seqY person follower reusing track id 11 (clash with seqX -> the
    # unique-ids pass must split them)
    for k in (1, 2, 3, 4, 5):
        rid += 1
        res.append(ann(rid, 200 + k, 2, 11, 1, (151, 121, 35, 90),
                       score=0.85))
    # seqY unmatched person dets (track 16): person not exhaustively
    # labeled in seqY -> removed
    for k in (1, 2, 3):
        rid += 1
        res.append(ann(rid, 200 + k, 2, 16, 1, (400, 300, 30, 60),
                       score=0.55))
    # seqY car det (track 17): no car gt but car IS negative in seqY ->
    # kept (counts as an FP)
    rid += 1
    res.append(ann(rid, 201, 2, 17, 2, (600, 100, 80, 50), score=0.5))

    os.makedirs(os.path.join(ROOT, "gt"), exist_ok=True)
    os.makedirs(os.path.join(ROOT, "trackers", "minitracker", "data"),
                exist_ok=True)
    with open(os.path.join(ROOT, "gt", "tao_mini.json"), "w") as f:
        json.dump(gt, f)
    with open(os.path.join(ROOT, "trackers", "minitracker", "data",
                           "results.json"), "w") as f:
        json.dump(res, f)
    print("fixture written under", ROOT)


if __name__ == "__main__":
    main()
