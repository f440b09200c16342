"""MOTRTransformer vs the reference deformable_transformer_plus torch
oracle: converted random-init weights must reproduce per-layer hidden
states and refined references (the same strategy as
tests/test_dino_transformer_parity.py)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from motr_reference_loader import load_motr_transformer  # noqa: E402

DIM = 256          # pos2posemb in the reference is pinned to 64*4 feats
HEADS = 8
LEVELS = 2
POINTS = 2
ENC, DEC = 1, 2
SHAPES = ((6, 8), (3, 4))
Q = 5


class _TorchMLP(torch.nn.Module):
    def __init__(self, input_dim, hidden_dim, output_dim, num_layers):
        super().__init__()
        self.num_layers = num_layers
        h = [hidden_dim] * (num_layers - 1)
        self.layers = torch.nn.ModuleList(
            torch.nn.Linear(n, k)
            for n, k in zip([input_dim] + h, h + [output_dim]))

    def forward(self, x):
        import torch.nn.functional as F
        for i, layer in enumerate(self.layers):
            x = F.relu(layer(x)) if i < self.num_layers - 1 else layer(x)
        return x


def _build_torch():
    mod = load_motr_transformer()
    tr = mod.DeformableTransformer(
        d_model=DIM, nhead=HEADS, num_encoder_layers=ENC,
        num_decoder_layers=DEC, dim_feedforward=512, dropout=0.0,
        activation="relu", return_intermediate_dec=True,
        num_feature_levels=LEVELS, dec_n_points=POINTS,
        enc_n_points=POINTS, two_stage=False)
    tr.decoder.bbox_embed = torch.nn.ModuleList(
        [_TorchMLP(DIM, DIM, 4, 3) for _ in range(DEC)])
    # non-degenerate refinement heads (reference inits them zero)
    g = torch.Generator().manual_seed(5)
    for mlp in tr.decoder.bbox_embed:
        for lin in mlp.layers:
            torch.nn.init.normal_(lin.weight, std=0.05, generator=g)
            torch.nn.init.normal_(lin.bias, std=0.05, generator=g)
    tr.eval()
    return tr


@pytest.mark.parametrize("with_mask", [False, True])
def test_motr_transformer_parity(with_mask):
    import jax
    import jax.numpy as jnp
    from fastervit_tpu.tracking.convert import convert_motr_transformer
    from fastervit_tpu.tracking.transformer import MOTRTransformer

    tr = _build_torch()
    rng = np.random.RandomState(0)
    srcs_t, pos_t, masks_t = [], [], []
    for (h, w) in SHAPES:
        srcs_t.append(torch.tensor(
            rng.randn(1, DIM, h, w).astype(np.float32)))
        pos_t.append(torch.tensor(
            rng.randn(1, DIM, h, w).astype(np.float32)))
        masks_t.append(torch.zeros(1, h, w, dtype=torch.bool))
    qe = torch.tensor(rng.randn(Q, DIM).astype(np.float32))
    rp = torch.tensor(rng.rand(Q, 4).astype(np.float32))
    attn_mask = None
    if with_mask:
        am = np.zeros((Q, Q), bool)
        am[:2, 2:] = True            # True = blocked (torch convention)
        attn_mask = torch.tensor(am)

    with torch.no_grad():
        hs, init_ref, inter_refs, _, _ = tr(srcs_t, masks_t, pos_t, qe,
                                            ref_pts=rp, attn_mask=attn_mask)

    ours = MOTRTransformer(dim=DIM, n_heads=HEADS, n_points=POINTS,
                           enc_layers=ENC, dec_layers=DEC, ffn_dim=512)
    src_flat = jnp.concatenate(
        [jnp.asarray(s.numpy()).transpose(0, 2, 3, 1).reshape(1, -1, DIM)
         for s in srcs_t], axis=1)
    pos_flat = jnp.concatenate(
        [jnp.asarray(p.numpy()).transpose(0, 2, 3, 1).reshape(1, -1, DIM)
         for p in pos_t], axis=1)
    qe_j = jnp.asarray(qe.numpy())[None]
    rp_j = jnp.asarray(rp.numpy())[None]
    mask_j = jnp.asarray(attn_mask.numpy()) if attn_mask is not None else None
    variables = ours.init(jax.random.PRNGKey(0), src_flat, SHAPES, pos_flat,
                          qe_j, rp_j, mask_j)
    variables = convert_motr_transformer(
        {k: v for k, v in tr.state_dict().items()}, variables)
    out = ours.apply(variables, src_flat, SHAPES, pos_flat, qe_j, rp_j,
                     mask_j)

    np.testing.assert_allclose(np.asarray(out["init_ref"][0]),
                               init_ref.numpy()[0], atol=1e-6)
    for li in range(DEC):
        np.testing.assert_allclose(
            np.asarray(out["hidden"][li][0]), hs[li, 0].numpy(),
            atol=2e-5, rtol=2e-5, err_msg=f"hidden layer {li}")
        np.testing.assert_allclose(
            np.asarray(out["refs"][li][0]), inter_refs[li, 0].numpy(),
            atol=2e-5, rtol=2e-5, err_msg=f"refs layer {li}")


def test_sine_position_embedding_matches_torch():
    """Our unpadded sine embedding vs the reference PositionEmbeddingSine
    (position_encoding.py:25-41, normalize=True)."""
    from fastervit_tpu.tracking.motr_exact import sine_position_embedding

    h, w, f = 7, 9, 128
    not_mask = torch.ones(1, h, w)
    y = not_mask.cumsum(1)
    x = not_mask.cumsum(2)
    eps, scale = 1e-6, 2 * np.pi
    y = (y - 0.5) / (y[:, -1:, :] + eps) * scale
    x = (x - 0.5) / (x[:, :, -1:] + eps) * scale
    dim_t = torch.arange(f, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / f)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), 4).flatten(3)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), 4).flatten(3)
    ref = torch.cat((py, px), dim=3)[0].numpy()
    got = sine_position_embedding(h, w, f)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_qimv2_update_matches_torch():
    """QIMv2 track-embedding update vs the reference module's
    _update_track_embedding (qim.py:147-175, eval semantics)."""
    import argparse
    import types as _types

    import jax
    import jax.numpy as jnp
    from motr_reference_loader import load_motr_qim
    from fastervit_tpu.tracking.convert import convert_motr_checkpoint
    from fastervit_tpu.tracking.motr_exact import QIMv2

    qim_mod = load_motr_qim()
    args = argparse.Namespace(random_drop=0.0, fp_ratio=0.0,
                              update_query_pos=False, merger_dropout=0.0)
    tq = qim_mod.QueryInteractionModulev2(args, dim_in=256, hidden_dim=1024,
                                          dim_out=256)
    tq.eval()

    rng = np.random.RandomState(0)
    T = 6
    inst = _types.SimpleNamespace(
        scores=torch.tensor(rng.rand(T).astype(np.float32)),
        pred_boxes=torch.tensor(rng.rand(T, 4).astype(np.float32)),
        ref_pts=torch.tensor(rng.rand(T, 4).astype(np.float32)),
        output_embedding=torch.tensor(rng.randn(T, 256).astype(np.float32)),
        query_pos=torch.tensor(rng.randn(T, 256).astype(np.float32)))
    ref_in = inst.ref_pts.clone()
    qp_in = inst.query_pos.clone()
    with torch.no_grad():
        out = tq._update_track_embedding(inst)

    ours = QIMv2(dim=256, hidden=1024)
    # reference mutates ref_pts for positives before the embed update
    is_pos = np.asarray(inst.scores) > 0.5
    refs = np.where(is_pos[:, None], np.asarray(inst.pred_boxes),
                    np.asarray(ref_in))
    v = ours.init(jax.random.PRNGKey(0),
                  jnp.asarray(np.asarray(inst.output_embedding))[None],
                  jnp.asarray(np.asarray(qp_in))[None],
                  jnp.asarray(refs)[None],
                  jnp.asarray(np.asarray(inst.scores))[None])
    sd = {"track_embed." + k: val for k, val in tq.state_dict().items()}
    wrapped = convert_motr_checkpoint(sd, {"params": {"qim": v["params"]}})
    new_feat = ours.apply({"params": wrapped["params"]["qim"]},
                          jnp.asarray(np.asarray(inst.output_embedding))[None],
                          jnp.asarray(np.asarray(qp_in))[None],
                          jnp.asarray(refs)[None],
                          jnp.asarray(np.asarray(inst.scores))[None])
    np.testing.assert_allclose(np.asarray(new_feat[0]),
                               out.query_pos.numpy(), atol=2e-5, rtol=2e-5)


def test_motr_detector_exact_builds_and_runs():
    """Assembly smoke: backbone -> sine pos -> exact transformer -> heads;
    empty_track_queries extends with proposal queries."""
    import jax
    import jax.numpy as jnp
    from fastervit_tpu.models.registry import get_config
    from fastervit_tpu.tracking.motr_exact import (MOTRDetectorExact,
                                                   empty_track_queries)

    cfg = get_config("faster_vit_0_any_res", resolution=[64, 96],
                     depths=[1, 1, 1, 1], dim=32, in_dim=16,
                     num_heads=[1, 2, 4, 8])
    det = MOTRDetectorExact(backbone_cfg=cfg, num_classes=1, dim=256,
                            num_queries=4, enc_layers=1, dec_layers=2,
                            ffn_dim=64)
    x = jnp.zeros((1, 64, 96, 3))
    qp = jnp.zeros((1, 4, 256))
    rp = jnp.full((1, 4, 4), 0.5)
    v = det.init(jax.random.PRNGKey(0), x, qp, rp)
    out = det.apply(v, x, qp, rp)
    assert len(out["logits"]) == 2 and len(out["boxes"]) == 2
    assert out["logits"][-1].shape == (1, 4, 1)
    assert out["boxes"][-1].shape == (1, 4, 4)
    b = np.asarray(out["boxes"][-1])
    assert (b >= 0).all() and (b <= 1).all()

    props = np.concatenate([np.full((3, 4), 0.4, np.float32),
                            np.full((3, 1), 0.9, np.float32)], -1)
    qp2, rp2 = empty_track_queries(v, 4, 256, proposals=props)
    assert qp2.shape == (1, 7, 256) and rp2.shape == (1, 7, 4)
    np.testing.assert_allclose(rp2[0, 4:], props[:, :4])


def test_exact_streaming_inference_runs():
    """Exact-semantics streaming loop: fresh-queries-first ordering, padded
    track slots masked out, RuntimeTrackerBase thresholds, QIM refresh."""
    import jax
    import jax.numpy as jnp
    from fastervit_tpu.models.registry import get_config
    from fastervit_tpu.tracking.motr_exact import (MOTRDetectorExact, QIMv2,
                                                   exact_inference_sequence)

    cfg = get_config("faster_vit_0_any_res", resolution=[64, 96],
                     depths=[1, 1, 1, 1], dim=32, in_dim=16,
                     num_heads=[1, 2, 4, 8])
    det = MOTRDetectorExact(backbone_cfg=cfg, num_classes=1, dim=256,
                            num_queries=3, enc_layers=1, dec_layers=1,
                            ffn_dim=64)
    qim = QIMv2(dim=256, hidden=64)
    cap, npp = 6, 2
    total = 3 + npp + cap
    x = jnp.zeros((1, 64, 96, 3))
    v = det.init(jax.random.PRNGKey(0), x,
                 jnp.zeros((1, total, 256)), jnp.full((1, total, 4), 0.5))
    vq = qim.init(jax.random.PRNGKey(1), jnp.zeros((1, total, 256)),
                  jnp.zeros((1, total, 256)), jnp.full((1, total, 4), 0.5),
                  jnp.zeros((1, total)), jnp.ones((1, total), bool))

    apply_with_mask = jax.jit(lambda vv, img, qp, rp, m: det.apply(
        vv, img, qp, rp, m))
    qim_fn = jax.jit(lambda oe, qf, rp, s, am: qim.apply(vq, oe, qf, rp, s,
                                                         am))

    rng = np.random.RandomState(0)
    frames = [rng.randn(64, 96, 3).astype(np.float32) for _ in range(3)]
    props = [np.concatenate([np.full((npp, 4), 0.4, np.float32),
                             np.full((npp, 1), 0.8, np.float32)], -1)
             for _ in range(3)]
    results = exact_inference_sequence(
        apply_with_mask, qim_fn, v, frames, num_queries=3, dim=256,
        proposals_per_frame=props, num_proposals=npp, track_capacity=cap,
        score_thresh=0.0)            # births guaranteed at random init
    assert len(results) == 3
    assert len(results[0]["ids"]) > 0
    # identities persist across frames (same slots stay active)
    assert set(results[0]["ids"]).issubset(set(results[1]["ids"]) |
                                           set(results[0]["ids"]))


def test_lite_encoder_param_compatible_and_runs():
    """lite_encoder=True keeps the exact same parameter tree (checkpoints
    load unchanged: the encoder weights don't depend on the query split),
    produces same-shaped outputs, and actually changes the numerics (it is
    a speed mode, not a no-op)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fastervit_tpu.tracking.transformer import MOTRTransformer

    rng = np.random.RandomState(0)
    shapes = ((8, 12), (4, 6), (2, 3))
    s = sum(h * w for h, w in shapes)
    src = jnp.asarray(rng.randn(1, s, 32), jnp.float32)
    pos = jnp.asarray(rng.randn(1, s, 32), jnp.float32)
    qe = jnp.asarray(rng.randn(1, 5, 32), jnp.float32)
    rp = jnp.asarray(rng.rand(1, 5, 4), jnp.float32)

    exact = MOTRTransformer(dim=32, n_heads=4, enc_layers=2, dec_layers=1,
                            ffn_dim=64)
    lite = MOTRTransformer(dim=32, n_heads=4, enc_layers=2, dec_layers=1,
                           ffn_dim=64, lite_encoder=True)
    v = exact.init(jax.random.PRNGKey(0), src, shapes, pos, qe, rp)
    v_lite = lite.init(jax.random.PRNGKey(0), src, shapes, pos, qe, rp)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v_lite)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(v)[0],
            jax.tree_util.tree_flatten_with_path(v_lite)[0]):
        assert a.shape == b.shape, (pa, a.shape, b.shape)

    out_e = exact.apply(v, src, shapes, pos, qe, rp)
    out_l = lite.apply(v, src, shapes, pos, qe, rp)   # same weights
    assert out_l["hidden"][-1].shape == out_e["hidden"][-1].shape
    assert out_l["refs"][-1].shape == out_e["refs"][-1].shape
    assert np.isfinite(np.asarray(out_l["refs"][-1])).all()
    # different numerics: stride-4 queries skip the encoder refinement
    assert float(np.abs(np.asarray(out_l["hidden"][-1])
                        - np.asarray(out_e["hidden"][-1])).max()) > 1e-6
