"""DETR-style detection augmentations (reference dino/datasets/transforms.py
semantics) + canvas padding."""
import numpy as np
import pytest

from fastervit_tpu.detection.transforms import (hflip, make_coco_train_transform,
                                                make_coco_val_transform,
                                                normalize_target,
                                                pad_to_canvas, random_size_crop,
                                                resize)


def _img(w=64, h=48):
    from PIL import Image

    return Image.fromarray(np.zeros((h, w, 3), np.uint8))


def test_hflip_boxes():
    t = {"boxes": np.array([[10., 5., 20., 15.]]), "labels": np.array([1])}
    img, t2 = hflip(_img(), t)
    np.testing.assert_allclose(t2["boxes"], [[44., 5., 54., 15.]])


def test_resize_short_side_and_max_size():
    t = {"boxes": np.array([[0., 0., 32., 24.]]), "labels": np.array([1])}
    img, t2 = resize(_img(64, 48), t, 96)          # short side 48 -> 96
    assert img.size == (128, 96)
    np.testing.assert_allclose(t2["boxes"], [[0., 0., 64., 48.]])
    # max_size caps the long side: 64/48 * 96 = 128 > 100 -> short ~75
    img3, _ = resize(_img(64, 48), t, 96, max_size=100)
    assert img3.size[0] <= 100 and img3.size[1] <= 100


def test_crop_drops_outside_boxes():
    t = {"boxes": np.array([[2., 2., 10., 10.], [40., 40., 60., 46.]]),
         "labels": np.array([1, 2])}
    rng = np.random.RandomState(0)
    from fastervit_tpu.detection.transforms import crop
    img, t2 = crop(_img(), t, (0, 0, 20, 20))
    assert len(t2["labels"]) == 1 and t2["labels"][0] == 1


def test_normalize_target_cxcywh():
    t = {"boxes": np.array([[16., 12., 48., 36.]]), "labels": np.array([1])}
    x, t2 = normalize_target(_img(64, 48), t)
    assert x.shape == (48, 64, 3) and x.dtype == np.float32
    np.testing.assert_allclose(t2["boxes"], [[0.5, 0.5, 0.5, 0.5]])


def test_train_transform_pipeline_runs():
    rng = np.random.RandomState(0)
    tr = make_coco_train_transform(scales=(32, 48), max_size=80,
                                   scales2_resize=(40,), scales2_crop=(24, 40))
    for _ in range(8):
        t = {"boxes": np.array([[4., 4., 30., 30.]]), "labels": np.array([1])}
        img, t2 = tr(_img(), t, rng)
        x, t3 = normalize_target(img, t2)
        assert (t3["boxes"] >= 0).all() and (t3["boxes"] <= 1).all()


def test_pad_to_canvas_mask():
    imgs = [np.ones((10, 12, 3), np.float32), np.ones((8, 16, 3), np.float32)]
    x, mask = pad_to_canvas(imgs, canvas=(12, 16))
    assert x.shape == (2, 12, 16, 3) and mask.shape == (2, 12, 16)
    assert not mask[0, :10, :12].any() and mask[0, 10:, :].all()
    assert not mask[1, :8, :16].any() and mask[1, 8:, :].all()
    assert x[0, 10:].sum() == 0
