"""MOT-file and COCO-json plumbing tests (roundtrips + end-to-end metric)."""
import json
import os

import numpy as np
from PIL import Image

from fastervit_tpu.tracking.mot_data import (build_eval_data,
                                             evaluate_mot_files,
                                             load_mot_file, write_mot_file)
import pytest

pytestmark = pytest.mark.smoke


def test_mot_roundtrip_and_perfect_hota(tmp_path):
    frames = [
        {"ids": np.array([1, 2]), "boxes": np.array([[0, 0, 10, 10],
                                                     [20, 20, 40, 40.]]),
         "scores": np.array([0.9, 0.8])},
        {"ids": np.array([1, 2]), "boxes": np.array([[1, 0, 11, 10],
                                                     [21, 20, 41, 40.]]),
         "scores": np.array([0.9, 0.8])},
    ]
    gt_path = str(tmp_path / "gt.txt")
    pred_path = str(tmp_path / "pred.txt")
    write_mot_file(gt_path, frames)
    write_mot_file(pred_path, frames)
    loaded = load_mot_file(gt_path)
    assert set(loaded) == {1, 2}
    np.testing.assert_allclose(loaded[1]["boxes"],
                               frames[0]["boxes"], atol=0.02)
    res = evaluate_mot_files(gt_path, pred_path)
    assert res["HOTA"] > 0.999 and res["MOTA"] == 1.0 and res["IDF1"] == 1.0


def test_mot_eval_detects_id_switch(tmp_path):
    gt = [{"ids": np.array([1]), "boxes": np.array([[0, 0, 10, 10.]])}] * 4
    pred = [{"ids": np.array([5]), "boxes": np.array([[0, 0, 10, 10.]])}] * 2 \
        + [{"ids": np.array([9]), "boxes": np.array([[0, 0, 10, 10.]])}] * 2
    write_mot_file(str(tmp_path / "gt.txt"), gt)
    write_mot_file(str(tmp_path / "pred.txt"), pred)
    res = evaluate_mot_files(str(tmp_path / "gt.txt"),
                             str(tmp_path / "pred.txt"))
    assert res["IDSW"] == 1 and abs(res["IDF1"] - 0.5) < 1e-9


def test_coco_dataset_and_eval(tmp_path):
    from fastervit_tpu.detection.coco_data import (CocoDetectionDataset,
                                                   targets_to_eval_gt)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (100, 200, 3), np.uint8)).save(
            img_dir / f"{i}.jpg")
    ann = {
        "images": [{"id": 10, "file_name": "0.jpg", "height": 100, "width": 200},
                   {"id": 11, "file_name": "1.jpg", "height": 100, "width": 200}],
        "categories": [{"id": 3, "name": "cat"}, {"id": 7, "name": "dog"}],
        "annotations": [
            {"id": 1, "image_id": 10, "category_id": 3,
             "bbox": [20, 10, 40, 30], "iscrowd": 0},
            {"id": 2, "image_id": 10, "category_id": 7,
             "bbox": [100, 50, 60, 40], "iscrowd": 0},
            {"id": 3, "image_id": 11, "category_id": 3,
             "bbox": [0, 0, 50, 50], "iscrowd": 0},
            {"id": 4, "image_id": 11, "category_id": 3,
             "bbox": [5, 5, 10, 10], "iscrowd": 1},  # crowd: skipped
        ],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    ds = CocoDetectionDataset(str(img_dir), str(ann_path), image_size=(64, 64))
    assert len(ds) == 2
    x, t = ds[0]
    assert x.shape == (64, 64, 3)
    assert t["labels"].tolist() == [0, 1]  # contiguous remap of cat ids 3, 7
    np.testing.assert_allclose(t["boxes"][0], [0.2, 0.25, 0.2, 0.3], atol=1e-6)

    batches = list(ds.batches(2))
    assert len(batches) == 1 and batches[0][0].shape == (2, 64, 64, 3)

    gts = targets_to_eval_gt(batches[0][1])
    np.testing.assert_allclose(gts[0]["boxes"][0], [20, 10, 60, 40], atol=1e-4)
    # perfect predictions -> mAP 1
    from fastervit_tpu.detection.coco_eval import evaluate_detections
    preds = [{"boxes": g["boxes"], "labels": g["labels"],
              "scores": np.ones(len(g["labels"]))} for g in gts]
    assert abs(evaluate_detections(preds, gts)["mAP"] - 1.0) < 1e-6
