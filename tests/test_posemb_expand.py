"""PosEmbMLPSwinv2D bias expansion: the separable one-hot-matmul form must
be bit-identical (fp32 tolerance) to the reference-shaped gather form.

The gather path mirrors the reference semantics (faster_vit.py:266-310:
table[relative_position_index] -> (S, S, H) -> transpose -> 16*sigmoid);
the separable path exploits the block-Toeplitz structure of the relative
offsets to expand via two one-hot contractions on the MXU
(CPB_EXPAND_PROBE.json: 9.1x at the 21k-768 level_2 geometry, w=48).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastervit_tpu.models import layers as L


def _bias(mod, params):
    return mod.apply(params)


@pytest.mark.parametrize(
    "wh,ww,heads,seq_extra,ct_correct",
    [
        (7, 7, 2, 0, False),          # fv0 window, no carrier
        (7, 7, 8, 4, False),          # carrier-padded (zero rows/cols)
        (7, 7, 8, 4, True),           # ct_correct index remap
        (8, 4, 4, 0, False),          # rectangular window (any-res)
        (24, 24, 32, 0, False),       # 21k-768 level_3 geometry
        pytest.param(48, 48, 16, 0, False, marks=pytest.mark.slow,
                     id="48-48-16-0-False"),  # 21k-768 level_2 (the hot one)
    ],
)
def test_separable_matches_gather(wh, ww, heads, seq_extra, ct_correct):
    s = wh * ww
    mod = L.PosEmbMLPSwinv2D(
        window_size=(wh, ww), pretrained_window_size=(wh, ww),
        num_heads=heads, seq_length=s + seq_extra, ct_correct=ct_correct)
    params = mod.init(jax.random.PRNGKey(0))
    prev = L.set_bias_expand("gather")
    try:
        ref = np.asarray(_bias(mod, params))
        L.set_bias_expand("separable")
        sep = np.asarray(_bias(mod, params))
    finally:
        L.set_bias_expand(prev)
    assert ref.shape == sep.shape == (heads, s + seq_extra, s + seq_extra)
    np.testing.assert_allclose(sep, ref, rtol=0, atol=2e-6)


def test_auto_gate_thresholds():
    """'auto' keeps the gather for the fv0-6 window (S=49) and switches to
    separable at the 21k large windows (S >= 1024)."""
    assert 7 * 7 < L._SEPARABLE_MIN_S <= 32 * 32


def test_delta_onehot_structure():
    oh = np.asarray(L._delta_onehot(5, jnp.float32))
    assert oh.shape == (5, 5, 9)
    p, q = np.nonzero(oh.sum(-1) == 1)
    assert len(p) == 25  # every (p, q) pair hits exactly one diagonal
    for i in range(5):
        for j in range(5):
            assert oh[i, j, i - j + 4] == 1.0
