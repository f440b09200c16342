"""Box op tests vs hand-computed values + torchvision-free torch oracle."""
import jax.numpy as jnp
import numpy as np

from fastervit_tpu.ops.boxes import (box_cxcywh_to_xyxy, box_iou,
                                     box_xyxy_to_cxcywh,
                                     generalized_box_iou,
                                     hungarian_cost_matrix, hungarian_match)
import pytest

pytestmark = pytest.mark.smoke


def test_box_conversions_roundtrip():
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.rand(10, 4) * 0.5 + jnp.asarray([0.2, 0.2, 0.1, 0.1]))
    np.testing.assert_allclose(
        np.asarray(box_xyxy_to_cxcywh(box_cxcywh_to_xyxy(b))), np.asarray(b),
        atol=1e-6)


def test_iou_and_giou_known_values():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0, 3.0],    # IoU 1/7
                     [0.0, 0.0, 2.0, 2.0],    # identical
                     [4.0, 4.0, 5.0, 5.0]])   # disjoint
    iou, _ = box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou[0]), [1 / 7, 1.0, 0.0], atol=1e-6)
    giou = generalized_box_iou(a, b)
    # overlap: enclosing [0,0,3,3] area 9, union 7 -> 1/7 - 2/9
    # disjoint: enclosing box [0,0,5,5] area 25, union 5 -> giou = 0 - 20/25
    np.testing.assert_allclose(np.asarray(giou[0]),
                               [1 / 7 - 2 / 9, 1.0, -0.8], atol=1e-6)


def test_hungarian_match_prefers_aligned_boxes():
    rng = np.random.RandomState(1)
    tgt_boxes = jnp.asarray([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]])
    tgt_labels = jnp.asarray([3, 5])
    pred_boxes = jnp.asarray([[0.7, 0.7, 0.2, 0.2],   # matches tgt 1
                              [0.1, 0.9, 0.1, 0.1],
                              [0.3, 0.3, 0.2, 0.2]])  # matches tgt 0
    logits = jnp.full((3, 10), -4.0)
    logits = logits.at[0, 5].set(4.0).at[2, 3].set(4.0)
    cost = hungarian_cost_matrix(logits, pred_boxes, tgt_labels, tgt_boxes)
    rows, cols = hungarian_match(np.asarray(cost))
    match = dict(zip(cols.tolist(), rows.tolist()))
    assert match == {0: 2, 1: 0}