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
