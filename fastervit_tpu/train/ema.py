"""Exponential moving average of a parameter pytree (reference: timm
ModelEmaV2 with decay 0.9998, train.py:519-525, 290-291)."""
from __future__ import annotations

import jax


def ema_update(ema_tree, new_tree, decay: float = 0.9998):
    return jax.tree.map(lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
                        ema_tree, new_tree)
