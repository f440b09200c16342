"""MOTR head tests: per-frame forward shapes, streaming id persistence,
clip-matcher track-consistency."""
import jax
import jax.numpy as jnp
import numpy as np

import fastervit_tpu as fvt
from fastervit_tpu.tracking.motr import (MOTRDetector, clip_matcher_loss,
                                         motr_inference_sequence)


def _tiny():
    cfg = fvt.get_config("faster_vit_0_224", depths=[1, 1, 1, 1],
                         num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
                         resolution=128)
    return MOTRDetector(backbone_cfg=cfg, num_classes=1, dim=64,
                        num_detect_queries=8, num_track_queries=8,
                        enc_layers=1, dec_layers=1)


def test_motr_forward_and_streaming():
    det = _tiny()
    x = jnp.zeros((1, 128, 128, 3))
    v = det.init(jax.random.PRNGKey(0), x)
    out = det.apply(v, x)
    assert out["logits"].shape == (1, 16, 1)
    assert out["boxes"].shape == (1, 16, 4)
    assert out["query_embed"].shape == (1, 16, 64)

    apply_fn = jax.jit(lambda v, im, te, tb: det.apply(v, im, track_embed=te,
                                                       track_boxes=tb))
    frames = [np.zeros((128, 128, 3), np.float32)] * 3
    res = motr_inference_sequence(apply_fn, v, frames, num_track_slots=8,
                                  dim=64, score_thresh=0.0, filter_thresh=0.0)
    assert len(res) == 3
    # with zero thresholds the track slots fill up and ids persist
    assert len(res[0]["ids"]) == 8
    np.testing.assert_array_equal(res[0]["ids"], res[1]["ids"])
    np.testing.assert_array_equal(res[1]["ids"], res[2]["ids"])
    # propagated query embeddings must reach the next frame's forward
    out0 = apply_fn(v, jnp.asarray(frames[0][None]),
                    jnp.zeros((1, 8, 64)), jnp.tile(
                        jnp.asarray([0.5, 0.5, 0.1, 0.1]), (1, 8, 1)))
    out1 = apply_fn(v, jnp.asarray(frames[0][None]),
                    jnp.asarray(out0["query_embed"][:, :8]),
                    out0["boxes"][:, :8])
    assert not np.allclose(np.asarray(out0["logits"]),
                           np.asarray(out1["logits"]))


def test_clip_matcher_keeps_slot_assignment():
    q, c, frames = 6, 1, 3
    rng = np.random.RandomState(0)
    gt_box = np.array([[0.5, 0.5, 0.2, 0.2]])
    outs, tgts = [], []
    logits = jnp.full((1, q, c), -4.0).at[0, 2, 0].set(4.0)
    boxes = jnp.asarray(rng.rand(1, q, 4) * 0.5 + 0.25)
    boxes = boxes.at[0, 2].set(jnp.asarray(gt_box[0]))
    for t in range(frames):
        outs.append({"logits": logits, "boxes": boxes})
        tgts.append({"track_ids": np.array([7]), "labels": np.array([0]),
                     "boxes": gt_box})
    loss = clip_matcher_loss(outs, tgts, num_classes=c)
    assert np.isfinite(float(loss["loss"]))
    # gt id 7 matched to slot 2 every frame -> near-zero box loss
    assert float(loss["loss_bbox"]) < 1e-5
    assert float(loss["loss_giou"]) < 1e-4


def test_motr_clip_training_learns():
    """End-to-end MOTR clip training: gradient flows through cross-frame
    query propagation and the clip-consistent matching; loss decreases."""
    import optax
    from fastervit_tpu.tracking.motr import motr_clip_train_epoch

    det = _tiny()
    frames = np.random.RandomState(0).randn(2, 1, 128, 128, 3).astype(
        np.float32)  # (F=2, B=1, H, W, 3)
    v = dict(det.init(jax.random.PRNGKey(0), jnp.asarray(frames[0])))
    targets_per_frame = [
        [{"track_ids": np.array([7]), "labels": np.array([0]),
          "boxes": np.array([[0.4, 0.4, 0.2, 0.2]])}],
        [{"track_ids": np.array([7]), "labels": np.array([0]),
          "boxes": np.array([[0.45, 0.4, 0.2, 0.2]])}],
    ]
    tx = optax.adamw(1e-4)
    opt_state = tx.init(v["params"])
    clips = [(frames, targets_per_frame)]
    losses = []
    for _ in range(3):
        v, opt_state, m = motr_clip_train_epoch(det, v, opt_state, tx, clips,
                                                max_targets=2)
        losses.append(m["loss"])
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_motr_clip_train_step_sharded_8dev(cpu_devices):
    """The MOTR clip train step compiles and runs batch-sharded over an
    8-device mesh (SURVEY §2.10 DP for the tracking engine): frames are
    (F, B, H, W, 3) with B sharded; GSPMD inserts the gradient all-reduce
    and the loss matches the unsharded step."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fastervit_tpu.parallel.mesh import create_mesh, replicated
    from fastervit_tpu.tracking.motr import make_motr_clip_train_step

    det = _tiny()
    f, b, t = 2, 8, 3
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(f, b, 128, 128, 3), jnp.float32)
    v = det.init(jax.random.PRNGKey(0), frames[0])
    tx = optax.adamw(1e-4)
    opt_state = tx.init(v["params"])
    tgt_labels = jnp.zeros((f, b, t), jnp.int32)
    tgt_boxes = jnp.tile(jnp.asarray([0.5, 0.5, 0.2, 0.2]), (f, b, t, 1))
    tgt_mask = jnp.tile(jnp.asarray([True, False, False]), (f, b, 1))
    assignment = jnp.where(tgt_mask, 2, -1).astype(jnp.int32)

    step = make_motr_clip_train_step(det, tx)
    _, _, loss_ref = step(v["params"], v.get("batch_stats", {}), opt_state,
                          frames, tgt_labels, tgt_boxes, tgt_mask, assignment)

    mesh = create_mesh(cpu_devices)
    repl = replicated(mesh)
    fsh = NamedSharding(mesh, P(None, "data"))    # batch is dim 1
    with mesh:
        sharded = jax.jit(
            make_motr_clip_train_step(det, tx),
            in_shardings=(repl, repl, repl, fsh, fsh, fsh, fsh, fsh))
        p2, o2, loss_sh = sharded(
            v["params"], v.get("batch_stats", {}), opt_state, frames,
            tgt_labels, tgt_boxes, tgt_mask, assignment)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
