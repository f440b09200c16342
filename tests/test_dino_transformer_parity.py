"""Exact-parity test: our DeformableTransformer vs the reference DINO
deformable transformer (torch oracle, MSDA CUDA extension stubbed with the
repo's own pure-torch grid_sample reference).

Mirrors the reference's operational verification style (SURVEY.md §4 item 4):
random weights flow torch -> flax through the production converter
(fastervit_tpu/detection/convert.py) and the full two-stage forward must
agree layer by layer — memory, interm (encoder top-k) outputs, per-layer
decoder logits/boxes.
"""
import copy

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dino_reference_loader import load_dino_transformer  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastervit_tpu.detection.convert import convert_dino_state_dict  # noqa: E402
from fastervit_tpu.detection.transformer import DeformableTransformer  # noqa: E402

DIM = 256           # gen_sineembed hardcodes 128 feats/coord => d_model 256
HEADS = 8
LEVELS = 2
POINTS = 2
ENC = 2
DEC = 2
FFN = 64
NQ = 12
NCLS = 5
SHAPES = ((6, 8), (3, 4))
B = 2


def _build_reference():
    m = load_dino_transformer()
    t = m.DeformableTransformer(
        d_model=DIM, nhead=HEADS, num_queries=NQ, num_encoder_layers=ENC,
        num_decoder_layers=DEC, dim_feedforward=FFN, dropout=0.0,
        activation="relu", return_intermediate_dec=True, query_dim=4,
        num_feature_levels=LEVELS, enc_n_points=POINTS, dec_n_points=POINTS,
        deformable_encoder=True, deformable_decoder=True,
        learnable_tgt_init=True, two_stage_type="standard",
        embed_init_tgt=True, decoder_sa_type="sa",
        module_seq=["sa", "ca", "ffn"])
    # heads, attached the way dino.py does (dino.py:132-169): shared decoder
    # box/class heads + separate (deep-copied) enc_out heads
    _bbox = m.MLP(DIM, DIM, 4, 3)
    _class = torch.nn.Linear(DIM, NCLS)
    t.decoder.bbox_embed = torch.nn.ModuleList([_bbox] * DEC)
    t.decoder.class_embed = torch.nn.ModuleList([_class] * DEC)
    t.enc_out_bbox_embed = copy.deepcopy(_bbox)
    t.enc_out_class_embed = copy.deepcopy(_class)
    # randomize so zero-init heads (MSDA offsets etc.) still exercise math
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in t.parameters():
            p.add_(0.02 * torch.randn(p.shape, generator=gen))
    t.eval()
    return t


def _pos_embeds(masks):
    import importlib

    pe_mod = importlib.import_module("models.dino.position_encoding")
    from util.misc import NestedTensor

    pe = pe_mod.PositionEmbeddingSineHW(
        DIM // 2, temperatureH=20, temperatureW=20, normalize=True)
    return [pe(NestedTensor(torch.zeros(B, DIM, h, w), mk))
            for (h, w), mk in zip(SHAPES, masks)]


@pytest.fixture(scope="module")
def parity_setup():
    t = _build_reference()
    rng = np.random.RandomState(1)
    srcs = [torch.tensor(rng.randn(B, DIM, h, w), dtype=torch.float32)
            for h, w in SHAPES]
    masks = [torch.zeros(B, h, w, dtype=torch.bool) for h, w in SHAPES]
    poss = _pos_embeds(masks)
    with torch.no_grad():
        hs, references, hs_enc, ref_enc, init_box_proposal = t(
            srcs, masks, None, poss, None, None)
    # dino.py:280-291 head application on the normed hidden states
    from util.misc import inverse_sigmoid as t_inverse_sigmoid
    with torch.no_grad():
        ref_boxes, ref_logits = [], []
        for lid in range(DEC):
            delta = t.decoder.bbox_embed[lid](hs[lid])
            unsig = delta + t_inverse_sigmoid(references[lid])
            ref_boxes.append(unsig.sigmoid())
            ref_logits.append(t.decoder.class_embed[lid](hs[lid]))

    model = DeformableTransformer(
        dim=DIM, n_heads=HEADS, n_points=POINTS, enc_layers=ENC,
        dec_layers=DEC, ffn_dim=FFN, num_queries=NQ, num_classes=NCLS)
    src_flat = jnp.concatenate(
        [jnp.asarray(s.numpy()).transpose(0, 2, 3, 1).reshape(B, -1, DIM)
         for s in srcs], axis=1)
    variables = model.init(jax.random.PRNGKey(0), src_flat, SHAPES)
    sd = t.state_dict()
    sd = {("transformer." + k if not k.startswith(("bbox_embed", "class_embed"))
           else k): v for k, v in sd.items()}
    wrapped = {"params": {"transformer": variables["params"]}}
    converted = convert_dino_state_dict(sd, wrapped)
    out = model.apply({"params": converted["params"]["transformer"]},
                      src_flat, SHAPES)
    return {
        "torch": {"hs": hs, "boxes": ref_boxes, "logits": ref_logits,
                  "hs_enc": hs_enc, "ref_enc": ref_enc,
                  "init_box_proposal": init_box_proposal, "t": t},
        "jax": out,
    }


def _close(a, b, tol=2e-4):
    a = np.asarray(a)
    b = b.detach().numpy() if hasattr(b, "detach") else np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_allclose(a, b, atol=tol, rtol=tol)


def test_interm_outputs_match(parity_setup):
    tt, jj = parity_setup["torch"], parity_setup["jax"]
    interm_class = tt["t"].enc_out_class_embed(tt["hs_enc"][-1])
    _close(jj["interm_logits"], interm_class)
    _close(jj["interm_boxes"], tt["ref_enc"][-1])
    _close(jj["init_proposals"], tt["init_box_proposal"])


def test_decoder_hidden_match(parity_setup):
    tt, jj = parity_setup["torch"], parity_setup["jax"]
    for lid in range(DEC):
        _close(jj["hidden"][lid], tt["hs"][lid], tol=5e-4)


def test_decoder_boxes_logits_match(parity_setup):
    tt, jj = parity_setup["torch"], parity_setup["jax"]
    for lid in range(DEC):
        _close(jj["logits"][lid], tt["logits"][lid], tol=5e-4)
        _close(jj["boxes"][lid], tt["boxes"][lid], tol=5e-4)


@pytest.fixture(scope="module")
def masked_parity_setup():
    """Same oracle comparison but with real padding masks (valid-ratio
    path): rectangular per-level masks as a downsampled image mask would
    produce."""
    t = _build_reference()
    rng = np.random.RandomState(3)
    srcs = [torch.tensor(rng.randn(B, DIM, h, w), dtype=torch.float32)
            for h, w in SHAPES]
    # image 0 fully valid; image 1 padded on the right/bottom
    valid = [[(h, w) for h, w in SHAPES],
             [(max(1, h - 2), max(1, w - 3)) for h, w in SHAPES]]
    masks = []
    for li, (h, w) in enumerate(SHAPES):
        m = torch.ones(B, h, w, dtype=torch.bool)
        for bi in range(B):
            vh, vw = valid[bi][li]
            m[bi, :vh, :vw] = False
        masks.append(m)
    poss = _pos_embeds(masks)
    with torch.no_grad():
        hs, references, hs_enc, ref_enc, init_box_proposal = t(
            srcs, masks, None, poss, None, None)
    from util.misc import inverse_sigmoid as t_inverse_sigmoid
    with torch.no_grad():
        ref_boxes, ref_logits = [], []
        for lid in range(DEC):
            delta = t.decoder.bbox_embed[lid](hs[lid])
            unsig = delta + t_inverse_sigmoid(references[lid])
            ref_boxes.append(unsig.sigmoid())
            ref_logits.append(t.decoder.class_embed[lid](hs[lid]))

    model = DeformableTransformer(
        dim=DIM, n_heads=HEADS, n_points=POINTS, enc_layers=ENC,
        dec_layers=DEC, ffn_dim=FFN, num_queries=NQ, num_classes=NCLS)
    src_flat = jnp.concatenate(
        [jnp.asarray(s.numpy()).transpose(0, 2, 3, 1).reshape(B, -1, DIM)
         for s in srcs], axis=1)
    mask_flat = jnp.concatenate(
        [jnp.asarray(m.numpy()).reshape(B, -1) for m in masks], axis=1)
    variables = model.init(jax.random.PRNGKey(0), src_flat, SHAPES,
                           padding_mask=mask_flat)
    sd = t.state_dict()
    sd = {("transformer." + k if not k.startswith(("bbox_embed",
                                                   "class_embed"))
           else k): v for k, v in sd.items()}
    wrapped = {"params": {"transformer": variables["params"]}}
    converted = convert_dino_state_dict(sd, wrapped)
    out = model.apply({"params": converted["params"]["transformer"]},
                      src_flat, SHAPES, padding_mask=mask_flat)
    return {"torch": {"hs": hs, "boxes": ref_boxes, "logits": ref_logits,
                      "hs_enc": hs_enc, "ref_enc": ref_enc, "t": t},
            "jax": out}


def test_masked_decoder_outputs_match(masked_parity_setup):
    tt, jj = masked_parity_setup["torch"], masked_parity_setup["jax"]
    for lid in range(DEC):
        _close(jj["hidden"][lid], tt["hs"][lid], tol=1e-3)
        _close(jj["logits"][lid], tt["logits"][lid], tol=1e-3)
        _close(jj["boxes"][lid], tt["boxes"][lid], tol=1e-3)


def test_masked_interm_outputs_match(masked_parity_setup):
    tt, jj = masked_parity_setup["torch"], masked_parity_setup["jax"]
    interm_class = tt["t"].enc_out_class_embed(tt["hs_enc"][-1])
    _close(jj["interm_logits"], interm_class, tol=1e-3)
    _close(jj["interm_boxes"], tt["ref_enc"][-1], tol=1e-3)
