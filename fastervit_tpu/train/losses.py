"""Training losses (reference train.py:671-689 selection logic + timm loss
semantics) and the MESA self-distillation term (train.py:354-361, 869-874)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothing_cross_entropy(logits, labels, smoothing: float = 0.1):
    """timm LabelSmoothingCrossEntropy: labels are int class ids."""
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -logp.mean(axis=-1)
    return ((1.0 - smoothing) * nll + smoothing * smooth).mean()


def soft_target_cross_entropy(logits, targets):
    """timm SoftTargetCrossEntropy: targets are (B, C) distributions
    (mixup/cutmix soft labels)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.sum(-targets * logp, axis=-1).mean()


def binary_cross_entropy(logits, targets, smoothing: float = 0.0,
                         target_threshold: float | None = None):
    """timm BinaryCrossEntropy over one-hot/soft targets."""
    n = logits.shape[-1]
    if targets.ndim == 1:
        targets = jax.nn.one_hot(targets, n)
    if smoothing > 0.0:
        targets = targets * (1.0 - smoothing) + smoothing / n
    if target_threshold is not None:
        targets = (targets >= target_threshold).astype(logits.dtype)
    logp = jax.nn.log_sigmoid(logits)
    log1mp = jax.nn.log_sigmoid(-logits)
    # torch BCEWithLogits(reduction='mean'): mean over all elements
    return -(targets * logp + (1.0 - targets) * log1mp).mean()


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def jsd_cross_entropy(logits_splits, labels, smoothing: float = 0.1,
                      alpha: float = 12.0):
    """timm JsdCrossEntropy for AugMix-style aug-splits: clean-split CE +
    alpha * Jensen-Shannon consistency across splits."""
    loss = label_smoothing_cross_entropy(logits_splits[0], labels, smoothing)
    probs = [jax.nn.softmax(l, axis=-1) for l in logits_splits]
    logm = jnp.log(jnp.clip(sum(probs) / len(probs), 1e-7, 1.0))
    kl = sum(jnp.sum(p * (jnp.log(jnp.clip(p, 1e-7)) - logm), -1).mean()
             for p in probs) / len(probs)
    return loss + alpha * kl


def mesa_kd_loss(student_logits, teacher_logits, temperature: float = 3.0):
    """MESA sharpness-aware KD vs the EMA teacher: 50 * KL(softmax(t/T) ||
    softmax(s/T)) batchmean (reference train.py:356-361)."""
    p = jax.nn.log_softmax(student_logits / temperature, axis=-1)
    q = jax.nn.softmax(teacher_logits / temperature, axis=-1)
    kl = jnp.sum(q * (jnp.log(jnp.clip(q, 1e-12)) - p), axis=-1)
    return 50.0 * kl.mean()
