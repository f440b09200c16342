"""Layout-transform unit tests: brute-force index checks + round trips.

The orderings are derived independently here with explicit loops; the model
parity test (test_parity.py) additionally pins them against the reference.
"""
import numpy as np
import jax.numpy as jnp

from fastervit_tpu.ops.windows import (ct_dewindow, ct_window,
                                       nearest_upsample_tokens,
                                       window_partition, window_reverse)
import pytest

pytestmark = pytest.mark.smoke


def test_window_partition_ordering():
    b, h, w, c, ws = 2, 4, 6, 3, 2
    x = np.arange(b * h * w * c, dtype=np.float32).reshape(b, h, w, c)
    out = np.asarray(window_partition(jnp.asarray(x), ws))
    n_wh, n_ww = h // ws, w // ws
    assert out.shape == (b * n_wh * n_ww, ws * ws, c)
    for bi in range(b):
        for wh in range(n_wh):
            for ww in range(n_ww):
                win = out[bi * n_wh * n_ww + wh * n_ww + ww]
                for ih in range(ws):
                    for iw in range(ws):
                        np.testing.assert_array_equal(
                            win[ih * ws + iw], x[bi, wh * ws + ih, ww * ws + iw])


def test_window_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 14, 21, 8).astype(np.float32)
    back = window_reverse(window_partition(jnp.asarray(x), 7), 7, 14, 21)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_ct_dewindow_ordering():
    """window-grouped -> raster: token (wh, ww, ih, iw) lands at raster
    (wh*cs+ih, ww*cs+iw)."""
    b, cs, n_wh, n_ww, c = 2, 2, 3, 4, 5
    gh, gw = n_wh * cs, n_ww * cs
    grouped = np.zeros((b, gh * gw, c), np.float32)
    t = 0
    for wh in range(n_wh):
        for ww in range(n_ww):
            for ih in range(cs):
                for iw in range(cs):
                    grouped[:, t, 0] = (wh * cs + ih) * 1000 + (ww * cs + iw)
                    t += 1
    raster = np.asarray(ct_dewindow(jnp.asarray(grouped), gh, gw, cs))
    for hh in range(gh):
        for www in range(gw):
            assert raster[0, hh * gw + www, 0] == hh * 1000 + www


def test_ct_roundtrip():
    rng = np.random.RandomState(1)
    for gh, gw, cs in [(4, 4, 2), (2, 8, 2), (6, 10, 2), (3, 3, 3)]:
        ct = rng.randn(2, gh * gw, 7).astype(np.float32)
        back = ct_window(ct_dewindow(jnp.asarray(ct), gh, gw, cs), gh, gw, cs)
        np.testing.assert_array_equal(np.asarray(back), ct)


def test_nearest_upsample_matches_torch_semantics():
    """index = floor(i * src / dst), the torch nn.Upsample 'nearest' rule."""
    x = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)  # (N, 2x2, C)
    up = np.asarray(nearest_upsample_tokens(jnp.asarray(x), 2, 7))
    assert up.shape == (2, 49, 3)
    idx = (np.arange(7) * 2) // 7
    grid = x.reshape(2, 2, 2, 3)
    expect = grid[:, idx][:, :, idx].reshape(2, 49, 3)
    np.testing.assert_array_equal(up, expect)
