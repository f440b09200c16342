"""Detection stack tests: detector shapes, criterion behavior, AP evaluator
with hand-computed expectations."""
import jax
import jax.numpy as jnp
import numpy as np

import fastervit_tpu as fvt
from fastervit_tpu.detection.coco_eval import evaluate_detections
from fastervit_tpu.detection.dino import (DINODetector, criterion,
                                          postprocess, sigmoid_focal_loss)


def _tiny_detector():
    cfg = fvt.get_config("faster_vit_0_224", depths=[1, 1, 1, 1],
                         num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
                         resolution=128)
    return DINODetector(backbone_cfg=cfg, num_classes=7, dim=64,
                        num_queries=20, enc_layers=1, dec_layers=2)


def test_detector_forward_shapes():
    det = _tiny_detector()
    x = jnp.zeros((2, 128, 128, 3))
    v = det.init(jax.random.PRNGKey(0), x)
    out = det.apply(v, x)
    assert len(out["logits"]) == 2 and len(out["boxes"]) == 2
    assert out["logits"][-1].shape == (2, 20, 7)
    assert out["boxes"][-1].shape == (2, 20, 4)
    b = np.asarray(out["boxes"][-1])
    assert (b >= 0).all() and (b <= 1).all()
    post = postprocess(out, jnp.asarray([[128, 128], [128, 128]]),
                       num_select=10)
    assert post["boxes"].shape == (2, 10, 4)
    assert post["labels"].max() < 7


def test_criterion_decreases_for_better_predictions():
    q, c = 8, 5
    targets = [{"labels": np.array([2]), "boxes": np.array([[0.5, 0.5, 0.2, 0.2]])}]
    good_logits = jnp.full((1, q, c), -6.0).at[0, 0, 2].set(6.0)
    good_boxes = jnp.tile(jnp.asarray([[0.9, 0.9, 0.05, 0.05]]), (q, 1))[None]
    good_boxes = good_boxes.at[0, 0].set(jnp.asarray([0.5, 0.5, 0.2, 0.2]))
    bad_logits = jnp.zeros((1, q, c))
    bad_boxes = jnp.tile(jnp.asarray([[0.1, 0.1, 0.9, 0.9]]), (q, 1))[None]
    good = criterion({"logits": [good_logits], "boxes": [good_boxes]},
                     targets, num_classes=c)
    bad = criterion({"logits": [bad_logits], "boxes": [bad_boxes]},
                    targets, num_classes=c)
    assert float(good["loss"]) < float(bad["loss"])
    assert float(good["loss_giou"]) < 0.1


def test_focal_loss_known_value():
    # p = 0.5 everywhere: focal = 0.25*0.25*ln2 for the positive entry
    logits = jnp.zeros((2, 3))
    targets = jnp.zeros((2, 3)).at[0, 1].set(1.0)
    loss = sigmoid_focal_loss(logits, targets)
    np.testing.assert_allclose(float(loss[0, 1]),
                               0.25 * 0.25 * np.log(2), rtol=1e-6)
    np.testing.assert_allclose(float(loss[0, 0]),
                               0.75 * 0.25 * np.log(2), rtol=1e-6)


def test_coco_eval_perfect_and_half():
    gt = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
           "labels": np.array([1, 1])}]
    perfect = [{"boxes": gt[0]["boxes"].copy(), "labels": np.array([1, 1]),
                "scores": np.array([0.9, 0.8])}]
    res = evaluate_detections(perfect, gt)
    assert abs(res["mAP"] - 1.0) < 1e-6 and abs(res["AP50"] - 1.0) < 1e-6
    # one detection matches, one is far off: AP ~= 0.5 at every threshold
    half = [{"boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]]),
             "labels": np.array([1, 1]), "scores": np.array([0.9, 0.8])}]
    res2 = evaluate_detections(half, gt)
    assert abs(res2["AP50"] - 0.5) < 0.02
    # detection at IoU ~0.6 counts at thr .5/.55/.6 but not above
    shifted = [{"boxes": np.array([[0, 2.5, 10, 12.5]]),
                "labels": np.array([1]), "scores": np.array([0.9])}]
    gt1 = [{"boxes": np.array([[0, 0, 10, 10]]), "labels": np.array([1])}]
    res3 = evaluate_detections(shifted, gt1)
    assert res3["AP50"] > 0.9 and res3["AP75"] == 0.0


def test_detection_training_learns(cpu_devices):
    """End-to-end detection training on one synthetic batch: the two-phase
    (device cost -> host Hungarian -> device grad) loop must reduce loss."""
    import optax
    from fastervit_tpu.detection.engine import train_detection_epoch
    det = _tiny_detector()
    x = np.random.RandomState(0).randn(2, 128, 128, 3).astype(np.float32)
    variables = det.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = dict(variables)
    targets = [
        {"labels": np.array([1]), "boxes": np.array([[0.3, 0.3, 0.2, 0.2]])},
        {"labels": np.array([2, 3]),
         "boxes": np.array([[0.6, 0.6, 0.2, 0.3], [0.2, 0.7, 0.1, 0.1]])},
    ]
    tx = optax.adamw(1e-4)
    opt_state = tx.init(variables["params"])
    loader = [(x, targets)] * 2
    losses = []
    for _ in range(3):
        variables, opt_state, m = train_detection_epoch(
            det, variables, opt_state, tx, loader, max_targets=4)
        losses.append(m["loss"])
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_cdn_denoising_forward_and_loss():
    """CDN: dn queries occupy the first slots, attention mask keeps groups
    blind, loss is finite and near-zero box loss for unnoised positives."""
    import jax
    from fastervit_tpu.detection.dino import cdn_loss, prepare_cdn
    from fastervit_tpu.detection.engine import pad_targets

    det = _tiny_detector()
    x = jnp.zeros((2, 128, 128, 3))
    targets = [
        {"labels": np.array([1]), "boxes": np.array([[0.3, 0.3, 0.2, 0.2]])},
        {"labels": np.array([2, 3]),
         "boxes": np.array([[0.6, 0.6, 0.2, 0.3], [0.2, 0.7, 0.1, 0.1]])},
    ]
    tgt = pad_targets(targets, max_targets=3)
    dn, meta = prepare_cdn(jax.random.PRNGKey(0), tgt, num_classes=7,
                           num_queries=20, dn_groups=2)
    assert dn["labels"].shape == (2, 12) and dn["boxes"].shape == (2, 12, 4)
    assert dn["attn_mask"].shape == (32, 32)
    # matching queries must not attend dn slots; dn CAN see matching
    # (reference dn_components.py:113-124)
    assert not np.asarray(dn["attn_mask"])[12:, :12].any()
    assert np.asarray(dn["attn_mask"])[:12, 12:].all()
    # group 0 cannot see group 1
    assert not np.asarray(dn["attn_mask"])[:6, 6:12].any()
    # dn boxes stay in [0, 1] after corner jitter
    assert (np.asarray(dn["boxes"]) >= 0).all()
    assert (np.asarray(dn["boxes"]) <= 1).all()

    v = det.init(jax.random.PRNGKey(0), x, dn=dn)
    out = det.apply(v, x, dn=dn)
    assert out["logits"][-1].shape == (2, 32, 7)
    losses = cdn_loss(out, tgt, meta, num_classes=7)
    assert np.isfinite(float(losses["loss_dn"]))

    # without dn the same params run the plain path (label_enc unused is ok)
    out2 = det.apply(v, x)
    assert out2["logits"][-1].shape == (2, 20, 7)


def test_cdn_loss_zero_box_for_exact_positives():
    from fastervit_tpu.detection.dino import cdn_loss
    from fastervit_tpu.detection.engine import pad_targets
    targets = [{"labels": np.array([1]),
                "boxes": np.array([[0.5, 0.5, 0.2, 0.2]])}]
    tgt = pad_targets(targets, max_targets=1)
    meta = {"n_dn": 2, "groups": 1, "t": 1}
    boxes = jnp.asarray([[[0.5, 0.5, 0.2, 0.2], [0.9, 0.9, 0.05, 0.05]]])
    logits = jnp.full((1, 2, 4), -8.0).at[0, 0, 1].set(8.0)
    losses = cdn_loss({"logits": [logits], "boxes": [boxes]}, tgt, meta,
                      num_classes=4)
    assert float(losses["loss_bbox_dn"]) < 1e-6
    assert float(losses["loss_giou_dn"]) < 1e-5
    assert float(losses["loss_ce_dn"]) < 1e-2


def test_coco_eval_full_breakdown():
    """Area-range/maxDet/AR breakdowns with hand-computable expectations
    (pycocotools 12-metric protocol, cocoeval.accumulate/summarize)."""
    gt = [{"boxes": np.array([[0., 0., 16., 16.],       # small (256 px²)
                              [100., 100., 300., 300.]]),  # large (40000)
           "labels": np.array([1, 1])}]
    pred = [{"boxes": gt[0]["boxes"].copy(), "labels": np.array([1, 1]),
             "scores": np.array([0.9, 0.8])}]
    res = evaluate_detections(pred, gt, full_breakdown=True)
    assert abs(res["mAP"] - 1.0) < 1e-6
    assert abs(res["APs"] - 1.0) < 1e-6
    assert abs(res["APl"] - 1.0) < 1e-6
    assert np.isnan(res["APm"])          # no medium gt anywhere
    assert abs(res["AR100"] - 1.0) < 1e-6
    # maxDet=1 keeps only the top-scored detection -> recall 1/2
    assert abs(res["AR1"] - 0.5) < 1e-6
    assert abs(res["ARs"] - 1.0) < 1e-6 and abs(res["ARl"] - 1.0) < 1e-6


def test_coco_eval_crowd_ignore():
    """A detection matching a crowd gt is neither TP nor FP; crowd gts are
    excluded from the recall denominator (cocoeval ignore semantics)."""
    gt = [{"boxes": np.array([[0., 0., 10., 10.], [50., 50., 80., 80.]]),
           "labels": np.array([1, 1]),
           "iscrowd": np.array([0, 1])}]
    pred = [{"boxes": np.array([[0., 0., 10., 10.], [52., 52., 78., 78.]]),
             "labels": np.array([1, 1]),
             "scores": np.array([0.8, 0.9])}]  # crowd-hit scores HIGHER
    res = evaluate_detections(pred, gt)
    # the crowd match must not poison precision: AP stays 1.0
    assert abs(res["mAP"] - 1.0) < 1e-6

    # same second box but as a plain FP (no crowd flag, low IoU with gt 0)
    gt2 = [{"boxes": np.array([[0., 0., 10., 10.]]),
            "labels": np.array([1])}]
    res2 = evaluate_detections(pred, gt2)
    assert res2["AP50"] < 0.6


def test_coco_eval_area_ignored_gt_not_counted():
    """GT outside the area range is ignored: a large-only image contributes
    nothing to APs (nan -> excluded, not zero)."""
    gt = [{"boxes": np.array([[0., 0., 200., 200.]]), "labels": np.array([1])}]
    pred = [{"boxes": np.array([[0., 0., 200., 200.]]),
             "labels": np.array([1]), "scores": np.array([0.9])}]
    res = evaluate_detections(pred, gt, full_breakdown=True)
    assert np.isnan(res["APs"]) and abs(res["APl"] - 1.0) < 1e-6


def test_cdn_adaptive_groups():
    """Group count adapts to keep ~dn_number total positive slots
    (reference dn_components.py:35-47: dn_number // max_gt)."""
    import jax
    from fastervit_tpu.detection.dino import prepare_cdn
    from fastervit_tpu.detection.engine import pad_targets

    targets = [{"labels": np.array([1, 2]),
                "boxes": np.array([[0.3, 0.3, 0.2, 0.2],
                                   [0.6, 0.6, 0.2, 0.2]])}]
    tgt = pad_targets(targets, max_targets=5)
    dn, meta = prepare_cdn(jax.random.PRNGKey(0), tgt, num_classes=7,
                           num_queries=20, dn_number=100)
    assert meta["groups"] == 20            # 100 // 5 padded slots
    assert meta["n_dn"] == 20 * 2 * 5


def test_remat_matches_no_remat():
    """remat=True (reference use_checkpoint) must not change outputs or
    gradients — only memory."""
    import jax
    import jax.numpy as jnp
    from fastervit_tpu.detection.dino import DINODetector
    from fastervit_tpu.models.registry import get_config

    cfg = get_config("faster_vit_0_224", resolution=64, depths=[1, 1, 1, 1],
                     dim=32, in_dim=16, num_heads=[1, 2, 4, 8])
    kw = dict(backbone_cfg=cfg, num_classes=5, dim=32, num_queries=10,
              enc_layers=1, dec_layers=1, num_feature_levels=4)
    det_a = DINODetector(remat=False, **kw)
    det_b = DINODetector(remat=True, **kw)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    v = det_a.init(jax.random.PRNGKey(0), x)

    def loss(det, params):
        out = det.apply({"params": params,
                         "batch_stats": v.get("batch_stats", {})}, x)
        return jnp.sum(out["boxes"][-1] ** 2) + jnp.sum(
            jax.nn.sigmoid(out["logits"][-1]))

    la, ga = jax.value_and_grad(lambda p: loss(det_a, p))(v["params"])
    lb, gb = jax.value_and_grad(lambda p: loss(det_b, p))(v["params"])
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5,
                                                         rtol=1e-5), ga, gb)


def test_detection_train_step_sharded_8dev(cpu_devices):
    """The detection train step compiles and runs batch-sharded over an
    8-device mesh (SURVEY §2.10 DP for the downstream engine): GSPMD
    inserts the gradient all-reduce; loss matches the unsharded step."""
    import jax
    import jax.numpy as jnp
    from fastervit_tpu.detection.dino import DINODetector
    from fastervit_tpu.detection.engine import (make_cost_fn, loss_layers,
                                                make_detection_train_step,
                                                pad_targets,
                                                solve_assignments)
    from fastervit_tpu.models.registry import get_config
    from fastervit_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                             replicated)
    import optax

    cfg = get_config("faster_vit_0_224", resolution=64, depths=[1, 1, 1, 1],
                     dim=32, in_dim=16, num_heads=[1, 2, 4, 8])
    det = DINODetector(backbone_cfg=cfg, num_classes=5, dim=32,
                       num_queries=8, enc_layers=1, dec_layers=1,
                       num_feature_levels=4)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 64, 64, 3), jnp.float32)
    v = det.init(jax.random.PRNGKey(0), x[:1])
    tx = optax.adamw(1e-4)
    opt_state = tx.init(v["params"])

    targets = [{"boxes": np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32),
                "labels": np.asarray([1], np.int32)} for _ in range(8)]
    tgt = jax.tree.map(jnp.asarray, pad_targets(targets, 4))
    fwd = jax.jit(lambda p, x: det.apply(
        {"params": p, "batch_stats": v.get("batch_stats", {})}, x))
    out = fwd(v["params"], x)
    costs = make_cost_fn(len(loss_layers(out)[0]))(out, tgt)
    assignment = jnp.asarray(solve_assignments(
        [np.asarray(c) for c in costs], np.asarray(tgt["mask"])))

    step = make_detection_train_step(det, tx)
    _, _, m_ref, _ = step(v["params"], v.get("batch_stats", {}), opt_state,
                          x, tgt, assignment)

    mesh = create_mesh(cpu_devices)
    repl, bsh = replicated(mesh), batch_sharding(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    # assignment is (layers, batch, targets): batch axis is dim 1
    ash = NamedSharding(mesh, P(None, "data"))
    from fastervit_tpu.detection.engine import detection_loss

    def raw_step(params, batch_stats, opt_state, images, tgt, assignment):
        def loss_fn(p):
            out = det.apply({"params": p, "batch_stats": batch_stats},
                            images, training=False)
            return detection_loss(out, tgt, assignment, det.num_classes)

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state2, {"loss": loss, **parts}

    with mesh:
        sharded = jax.jit(
            raw_step,
            in_shardings=(repl, repl, repl, bsh,
                          jax.tree.map(lambda _: bsh, tgt),
                          ash))
        p2, o2, m_sh = sharded(v["params"], v.get("batch_stats", {}),
                               opt_state, x, tgt, assignment)
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)


def test_detection_ema_tracks_params():
    """ema_decay > 0 threads an EMA tree through the epoch (reference dino
    ModelEma): after updates, EMA lies between init and current params."""
    import jax
    import jax.numpy as jnp
    import optax
    from fastervit_tpu.detection.dino import DINODetector
    from fastervit_tpu.detection.engine import train_detection_epoch
    from fastervit_tpu.models.registry import get_config

    cfg = get_config("faster_vit_0_224", resolution=64, depths=[1, 1, 1, 1],
                     dim=32, in_dim=16, num_heads=[1, 2, 4, 8])
    det = DINODetector(backbone_cfg=cfg, num_classes=3, dim=32,
                       num_queries=6, enc_layers=1, dec_layers=1)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    v = det.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(v["params"])
    init_leaf = np.asarray(jax.tree.leaves(v["params"])[0]).copy()

    def loader():
        targets = [{"boxes": np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32),
                    "labels": np.asarray([1], np.int32)}]
        for _ in range(2):
            yield x, targets

    v2, _, _ = train_detection_epoch(det, v, opt_state, tx, loader(),
                                     max_targets=4, ema_decay=0.5)
    assert "ema_params" in v2
    cur = np.asarray(jax.tree.leaves(v2["params"])[0])
    ema = np.asarray(jax.tree.leaves(v2["ema_params"])[0])
    # EMA moved away from init toward current, but lags it
    assert not np.allclose(ema, init_leaf)
    assert not np.allclose(ema, cur)
    d_ema = np.abs(ema - init_leaf).mean()
    d_cur = np.abs(cur - init_leaf).mean()
    assert d_ema < d_cur


def test_five_scale_level_geometry():
    """5scale (reference return_interm_indices=[0,1,2,3] + one extra
    stride-2 level) vs 4scale: level counts and stride progression."""
    import jax
    import jax.numpy as jnp
    from fastervit_tpu.detection.dino import DINODetector
    from fastervit_tpu.models.registry import get_config

    cfg = get_config("faster_vit_0_224", resolution=64, depths=[1, 1, 1, 1],
                     dim=32, in_dim=16, num_heads=[1, 2, 4, 8])
    det5 = DINODetector(backbone_cfg=cfg, num_classes=3, dim=32,
                        num_queries=6, enc_layers=1, dec_layers=1,
                        num_feature_levels=5,
                        return_interm_indices=(0, 1, 2, 3))
    x = jnp.zeros((1, 64, 64, 3))
    v = det5.init(jax.random.PRNGKey(0), x)
    # input projections 0..3 are 1x1 on strides 4/8/16/32; proj 4 is the
    # 3x3 stride-2 extra level
    p = v["params"]
    assert p["input_proj_0"]["kernel"].shape[:2] == (1, 1)
    assert p["input_proj_4"]["kernel"].shape[:2] == (3, 3)
    out = det5.apply(v, x)
    assert out["logits"][-1].shape[1] == 6


def test_five_scale_config_builds():
    from fastervit_tpu.detection.dino import build_dino_from_config
    from fastervit_tpu.utils.pyconfig import PyConfig

    cfg = PyConfig.fromfile(
        "configs/dino/dino_5scale_faster_vit_4_21k_224.py")
    assert cfg["num_feature_levels"] == 5
    assert cfg["return_interm_indices"] == [0, 1, 2, 3]
    det = build_dino_from_config(cfg)
    assert det.num_feature_levels == 5
    assert det.return_interm_indices == (0, 1, 2, 3)
