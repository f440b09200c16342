"""On-device auction matcher: eps-optimality vs the exact scipy Hungarian
oracle, padded-target handling, and the fully-jitted fused train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastervit_tpu.detection.matcher_device import (assignment_cost,
                                                    auction_match,
                                                    solve_assignments_device)
from fastervit_tpu.ops.boxes import hungarian_match



def _optimal_cost(cost):
    rows, cols = hungarian_match(cost)
    return float(np.asarray(cost)[rows, cols].sum())


@pytest.mark.parametrize("q,t,seed", [(20, 5, 0), (50, 10, 1), (900, 20, 2),
                                      (8, 8, 3)])
def test_auction_matches_hungarian_within_eps(q, t, seed):
    rng = np.random.RandomState(seed)
    cost = rng.randn(q, t).astype(np.float32) * 3.0
    valid = np.ones((t,), bool)
    eps = 1e-3
    assign = np.asarray(auction_match(jnp.asarray(cost), jnp.asarray(valid),
                                      eps))
    # a valid assignment: distinct queries, all targets matched
    assert (assign >= 0).all()
    assert len(set(assign.tolist())) == t
    got = assignment_cost(cost, assign)
    want = _optimal_cost(cost)
    assert got <= want + t * eps + 1e-6, (got, want)


def test_auction_respects_valid_mask():
    rng = np.random.RandomState(0)
    cost = rng.randn(10, 6).astype(np.float32)
    valid = np.array([True, False, True, True, False, False])
    assign = np.asarray(auction_match(jnp.asarray(cost), jnp.asarray(valid)))
    assert (assign[~valid] == -1).all()
    a = assign[valid]
    assert (a >= 0).all() and len(set(a.tolist())) == valid.sum()
    got = assignment_cost(cost, assign)
    want = _optimal_cost(cost[:, valid])
    assert got <= want + valid.sum() * 1e-3 + 1e-6


def test_auction_all_invalid_is_noop():
    cost = jnp.zeros((5, 3))
    assign = np.asarray(auction_match(cost, jnp.zeros((3,), bool)))
    np.testing.assert_array_equal(assign, [-1, -1, -1])


def test_solve_assignments_device_matches_host_shape():
    """Batched/stacked wrapper mirrors engine.solve_assignments layout:
    (L, B, T) query-per-target, -1 at padded targets."""
    rng = np.random.RandomState(0)
    costs = [jnp.asarray(rng.randn(3, 12, 4).astype(np.float32)),
             jnp.asarray(rng.randn(3, 9, 4).astype(np.float32))]
    mask = jnp.asarray(np.array([[1, 1, 0, 0], [1, 1, 1, 1], [0, 0, 0, 0]],
                                bool))
    out = np.asarray(solve_assignments_device(costs, mask))
    assert out.shape == (2, 3, 4)
    assert (out[:, 2] == -1).all()                      # empty image
    assert (out[:, 0, 2:] == -1).all()                  # padded targets
    for li, c in enumerate(costs):
        for bi in range(3):
            n = int(mask[bi].sum())
            if n == 0:
                continue
            got = assignment_cost(np.asarray(c[bi]), out[li, bi])
            want = _optimal_cost(np.asarray(c[bi])[:, :n])
            assert got <= want + n * 1e-3 + 1e-6


def test_fused_train_step_learns(cpu_devices):
    """The single-jit (forward -> auction -> loss -> grad) step reduces loss
    on a fixed synthetic batch, like the two-phase engine does."""
    import optax
    from fastervit_tpu.detection.dino import DINODetector
    from fastervit_tpu.detection.engine import (loss_layers,
                                                make_fused_detection_train_step,
                                                pad_targets)
    from fastervit_tpu.models.registry import get_config

    cfg = get_config("faster_vit_0_224", resolution=64, depths=[1, 1, 1, 1],
                     dim=32, in_dim=16, num_heads=[1, 2, 4, 8])
    det = DINODetector(backbone_cfg=cfg, num_classes=5, dim=32,
                       num_queries=8, enc_layers=1, dec_layers=1,
                       num_feature_levels=4)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    v = det.init(jax.random.PRNGKey(0), x[:1])
    tx = optax.adamw(1e-3)
    opt_state = tx.init(v["params"])
    targets = [{"boxes": np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32),
                "labels": np.asarray([1], np.int32)} for _ in range(2)]
    tgt = jax.tree.map(jnp.asarray, pad_targets(targets, 4))

    out = det.apply(v, x)
    step = make_fused_detection_train_step(det, tx,
                                           len(loss_layers(out)[0]))
    params = v["params"]
    losses = []
    for _ in range(8):
        params, opt_state, m, _ = step(params, v.get("batch_stats", {}),
                                       opt_state, x, tgt)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_fused_step_matches_two_phase_loss(cpu_devices):
    """On a batch whose cost matrices have a unique optimum, the fused
    (auction) step computes exactly the two-phase (host Hungarian) loss —
    pinning the fused path's cost->assignment->loss plumbing to the
    reference-semantics engine."""
    import optax
    from fastervit_tpu.detection.dino import DINODetector
    from fastervit_tpu.detection.engine import (loss_layers, make_cost_fn,
                                                make_detection_train_step,
                                                make_fused_detection_train_step,
                                                pad_targets, solve_assignments)
    from fastervit_tpu.models.registry import get_config

    cfg = get_config("faster_vit_0_224", resolution=64, depths=[1, 1, 1, 1],
                     dim=32, in_dim=16, num_heads=[1, 2, 4, 8])
    det = DINODetector(backbone_cfg=cfg, num_classes=5, dim=32,
                       num_queries=8, enc_layers=1, dec_layers=1,
                       num_feature_levels=4)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    v = det.init(jax.random.PRNGKey(0), x[:1])
    tx = optax.adamw(1e-4)
    opt_state = tx.init(v["params"])
    targets = [{"boxes": np.asarray([[0.5, 0.5, 0.2, 0.2],
                                     [0.2, 0.3, 0.1, 0.1]], np.float32),
                "labels": np.asarray([1, 3], np.int32)} for _ in range(2)]
    tgt = jax.tree.map(jnp.asarray, pad_targets(targets, 4))

    out = det.apply(v, x)
    nl = len(loss_layers(out)[0])
    costs = make_cost_fn(nl)(out, tgt)
    assignment = jnp.asarray(solve_assignments(
        [np.asarray(c) for c in costs], np.asarray(tgt["mask"])))
    two_phase = make_detection_train_step(det, tx)
    _, _, m_ref, _ = two_phase(v["params"], v.get("batch_stats", {}),
                               opt_state, x, tgt, assignment)
    fused = make_fused_detection_train_step(det, tx, nl)
    _, _, m_fused, _ = fused(v["params"], v.get("batch_stats", {}),
                             opt_state, x, tgt)
    np.testing.assert_allclose(float(m_fused["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)


def test_auction_and_hungarian_converge_alike(cpu_devices):
    """Convergence equivalence (not just one-step loss equality): training
    the synthetic detection task with the fused auction matcher reaches the
    same final loss as the reference-semantics two-phase host Hungarian —
    the evidence behind matcher='auto' defaulting to auction on TPU
    (detection/engine.py train_detection_epoch)."""
    import optax
    from fastervit_tpu.detection.dino import DINODetector
    from fastervit_tpu.detection.engine import train_detection_epoch
    from fastervit_tpu.models.registry import get_config

    cfg = get_config("faster_vit_0_224", resolution=64, depths=[1, 1, 1, 1],
                     dim=32, in_dim=16, num_heads=[1, 2, 4, 8])
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    targets = [
        {"labels": np.array([1]), "boxes": np.array([[0.3, 0.3, 0.2, 0.2]])},
        {"labels": np.array([2, 3]),
         "boxes": np.array([[0.6, 0.6, 0.2, 0.3], [0.2, 0.7, 0.1, 0.1]])},
    ]
    loader = [(x, targets)] * 2

    finals = {}
    for matcher in ("host", "auction"):
        det = DINODetector(backbone_cfg=cfg, num_classes=5, dim=32,
                           num_queries=8, enc_layers=1, dec_layers=1,
                           num_feature_levels=4)
        variables = dict(det.init(jax.random.PRNGKey(0), jnp.asarray(x)))
        tx = optax.adamw(1e-3)
        opt_state = tx.init(variables["params"])
        losses, cache = [], {}
        for _ in range(10):
            variables, opt_state, m = train_detection_epoch(
                det, variables, opt_state, tx, loader, max_targets=4,
                matcher=matcher, step_cache=cache)
            losses.append(m["loss"])
        assert all(np.isfinite(losses)), (matcher, losses)
        assert losses[-1] < 0.75 * losses[0], (matcher, losses)
        finals[matcher] = losses

    # same trajectory endpoint within 5% — eps-optimal assignments may
    # differ from the exact Hungarian on near-tie steps, but training
    # converges to the same place
    h, a = finals["host"][-1], finals["auction"][-1]
    assert abs(h - a) / h < 0.05, finals


def test_matcher_auto_resolves_by_backend():
    """matcher='auto' picks host off-TPU (this suite runs on CPU) and the
    engine accepts the resolved value."""
    import jax as _jax
    from fastervit_tpu.detection import engine

    resolved = ("auction" if _jax.default_backend() == "tpu" else "host")
    assert resolved == "host"  # suite invariant: CPU backend
