"""Jitted Mixup/CutMix batch transform (timm Mixup semantics, batch mode —
the reference trains with mixup 0.8 / cutmix 1.0 / switch 0.5 / smoothing 0.1,
configs/faster_vit_0_224_1k.yaml + train.py:605-617).

Runs on device inside the train step: static shapes, mask-based cutmix (no
dynamic slicing), mixing partner is the flipped batch (timm's x.flip(0))."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MixupConfig:
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    prob: float = 1.0
    switch_prob: float = 0.5
    label_smoothing: float = 0.1
    num_classes: int = 1000


def _one_hot(labels, num_classes, on, off):
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox_mask(rng, h, w, lam):
    """Cutmix box mask of relative area (1-lam), centered uniformly
    (timm rand_bbox). Returns (mask (h, w), corrected lam)."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = jnp.round(h * ratio).astype(jnp.int32)
    cut_w = jnp.round(w * ratio).astype(jnp.int32)
    ry, rx = jax.random.randint(rng, (2,), 0, jnp.asarray([h, w]))
    y1 = jnp.clip(ry - cut_h // 2, 0, h)
    y2 = jnp.clip(ry + cut_h // 2, 0, h)
    x1 = jnp.clip(rx - cut_w // 2, 0, w)
    x2 = jnp.clip(rx + cut_w // 2, 0, w)
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    mask = ((rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2))
    lam_corrected = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)
    return mask, lam_corrected


def mixup_cutmix(rng, images, labels, cfg: MixupConfig):
    """Apply batch-mode mixup/cutmix; returns (mixed_images NHWC, soft_targets).

    images: (B, H, W, C) float; labels: (B,) int."""
    b, h, w, _ = images.shape
    r_apply, r_switch, r_lam_mix, r_lam_cut, r_box = jax.random.split(rng, 5)

    apply = jax.random.uniform(r_apply) < cfg.prob
    use_cutmix = jnp.logical_and(
        cfg.cutmix_alpha > 0,
        jnp.logical_or(cfg.mixup_alpha <= 0,
                       jax.random.uniform(r_switch) < cfg.switch_prob))

    lam_mix = (jax.random.beta(r_lam_mix, cfg.mixup_alpha, cfg.mixup_alpha)
               if cfg.mixup_alpha > 0 else jnp.float32(1.0))
    lam_cut = (jax.random.beta(r_lam_cut, cfg.cutmix_alpha, cfg.cutmix_alpha)
               if cfg.cutmix_alpha > 0 else jnp.float32(1.0))

    flipped = images[::-1]
    mask, lam_cut_c = _rand_bbox_mask(r_box, h, w, lam_cut)
    cut_images = jnp.where(mask[None, :, :, None], flipped, images)
    mix_images = images * lam_mix + flipped * (1.0 - lam_mix)

    lam = jnp.where(use_cutmix, lam_cut_c, lam_mix)
    mixed = jnp.where(use_cutmix, cut_images, mix_images)
    mixed = jnp.where(apply, mixed, images)
    lam = jnp.where(apply, lam, 1.0)

    off = cfg.label_smoothing / cfg.num_classes
    on = 1.0 - cfg.label_smoothing + off
    y1 = _one_hot(labels, cfg.num_classes, on, off)
    y2 = _one_hot(labels[::-1], cfg.num_classes, on, off)
    targets = y1 * lam + y2 * (1.0 - lam)
    return mixed, targets
