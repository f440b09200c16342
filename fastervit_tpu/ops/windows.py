"""Window / carrier-token layout transforms (pure jnp, NHWC).

TPU-native rethink of the reference's NCHW layout ops
(/root/reference/fastervit/models/faster_vit.py:83-109). Activations are kept
NHWC (XLA's preferred conv layout); every transform below is a
reshape+transpose pair that XLA folds into the surrounding fusion, so none of
these materialize extra HBM traffic on their own.

Token orderings (must match the reference bit-for-bit for weight parity):

* window tokens:   windows are raster-ordered over the image (row-major over
  the (H/ws, W/ws) grid); tokens inside a window are raster-ordered too.
* carrier tokens, "window-grouped" order: all ct of window (0,0), then window
  (0,1), ... (window raster order; ct raster order inside each window).
* carrier tokens, "global raster" order: the (gh, gw) = (nWh*cs, nWw*cs)
  carrier-token grid flattened row-major.
"""
from __future__ import annotations

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C).

    NHWC analog of reference window_partition (faster_vit.py:83-87).
    H and W must be multiples of window_size (pad first otherwise).
    """
    b, h, w, c = x.shape
    ws = window_size
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, window_size: int, h: int, w: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C). Inverse of window_partition."""
    ws = window_size
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def ct_dewindow(ct: jnp.ndarray, grid_h: int, grid_w: int, ct_size: int) -> jnp.ndarray:
    """Carrier tokens: window-grouped order -> global raster order.

    ct: (B, T, C) with T = grid_h*grid_w; grid_h = nWh*ct_size etc.
    Semantics of reference ct_dewindow (faster_vit.py:96-101), generalized to
    rectangular grids (faster_vit_any_res.py usage passes per-axis grids).
    """
    b, t, c = ct.shape
    cs = ct_size
    x = ct.reshape(b, grid_h // cs, grid_w // cs, cs, cs, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nWh, cs, nWw, cs, C)
    return x.reshape(b, t, c)


def ct_window(ct: jnp.ndarray, grid_h: int, grid_w: int, ct_size: int) -> jnp.ndarray:
    """Carrier tokens: global raster order -> window-grouped order.

    Inverse of ct_dewindow; matches reference ct_window (faster_vit.py:104-109)
    followed by the flatten the reference does at the call site
    (faster_vit.py:683-685).
    """
    b, t, c = ct.shape
    cs = ct_size
    x = ct.reshape(b, grid_h // cs, cs, grid_w // cs, cs, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nWh, nWw, cs, cs, C)
    return x.reshape(b, t, c)


def nearest_upsample_tokens(x: jnp.ndarray, src: int, dst: int) -> jnp.ndarray:
    """(N, src*src, C) -> (N, dst*dst, C) nearest-neighbor spatial upsample.

    Matches torch nn.Upsample(size=dst, mode='nearest') on a (src, src) grid
    (index = floor(i * src / dst)); used by carrier-token propagation
    (faster_vit.py:697-700).
    """
    n, _, c = x.shape
    grid = x.reshape(n, src, src, c)
    idx = (jnp.arange(dst) * src) // dst
    grid = grid[:, idx][:, :, idx]
    return grid.reshape(n, dst * dst, c)
