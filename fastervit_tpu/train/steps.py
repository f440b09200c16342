"""Jitted train / eval steps (reference train.py:820-951 `train_one_epoch`
inner loop and :954-1017 `validate`, re-designed as pure functions).

One fused train step = mixup -> forward (train-mode BN) -> loss (+ MESA KD
vs the EMA teacher) -> grad -> clip 5.0 -> optimizer -> EMA update. Under a
batch-sharded jit, XLA handles the DDP gradient all-reduce and global-batch
BN statistics (see fastervit_tpu.parallel.mesh).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from fastervit_tpu.train import losses as L
from fastervit_tpu.train.ema import ema_update
from fastervit_tpu.train.mixup import MixupConfig, mixup_cutmix


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None
    ema_batch_stats: Any = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference TRAINING.md + train.py defaults)."""
    clip_grad: float = 5.0
    weight_decay: float = 0.05
    opt: str = "adamw"                # 'adamw' | 'lamb' (train.py:486, TRAINING.md:28,105)
    ema_decay: float = 0.9998
    use_ema: bool = True
    smoothing: float = 0.1
    bce_loss: bool = False
    mixup: Optional[MixupConfig] = MixupConfig()
    mesa: float = 0.0                 # MESA weight (0.1..5.0 by variant)
    mesa_start_step: int = 0          # start at 25% of total steps
    grad_checkpoint: bool = False


def create_optimizer(schedule_fn, cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.opt == "adamw":
        opt = optax.adamw(schedule_fn, b1=0.9, b2=0.999, eps=1e-8,
                          weight_decay=cfg.weight_decay)
    elif cfg.opt == "lamb":
        opt = optax.lamb(schedule_fn, weight_decay=cfg.weight_decay)
    else:
        raise ValueError(f"unknown optimizer {cfg.opt!r}")
    if cfg.clip_grad:
        return optax.chain(optax.clip_by_global_norm(cfg.clip_grad), opt)
    return opt


def create_train_state(model, tx: optax.GradientTransformation,
                       rng=None, cfg: TrainConfig = TrainConfig()) -> TrainState:
    variables = model.init(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params, batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if cfg.use_ema else None,
        ema_batch_stats=jax.tree.map(jnp.copy, batch_stats) if cfg.use_ema else None,
    )


def make_train_step(module, tx: optax.GradientTransformation,
                    cfg: TrainConfig = TrainConfig(),
                    schedule_fn: Optional[Callable] = None):
    """Returns train_step(state, batch, rng) -> (state, metrics).
    batch = {'image': NHWC float, 'label': (B,) int}."""

    def forward(params, batch_stats, images, rng_drop):
        return module.apply({"params": params, "batch_stats": batch_stats},
                            images, training=True, rngs={"dropout": rng_drop},
                            mutable=["batch_stats"])

    if cfg.grad_checkpoint:
        # rematerialize the forward (reference --grad-checkpointing,
        # train.py:141-142); per-stage remat policies can come later
        forward = jax.checkpoint(forward)

    def loss_from_logits(logits, targets, soft):
        if soft:
            return L.soft_target_cross_entropy(logits, targets)
        if cfg.bce_loss:
            return L.binary_cross_entropy(logits, targets, smoothing=cfg.smoothing)
        if cfg.smoothing > 0:
            return L.label_smoothing_cross_entropy(logits, targets, cfg.smoothing)
        return L.cross_entropy(logits, targets)

    def train_step(state: TrainState, batch, rng):
        rng_mix, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        images, labels = batch["image"], batch["label"]
        if cfg.mixup is not None:
            images, targets = mixup_cutmix(rng_mix, images, labels, cfg.mixup)
            soft = True
        else:
            targets, soft = labels, False

        def loss_fn(params):
            logits, mut = forward(params, state.batch_stats, images, rng_drop)
            loss = loss_from_logits(logits, targets, soft)
            loss = loss.astype(jnp.float32)
            if cfg.mesa > 0.0 and state.ema_params is not None:
                def kd(_):
                    teacher = module.apply(
                        {"params": state.ema_params,
                         "batch_stats": state.ema_batch_stats}, images)
                    return L.mesa_kd_loss(
                        logits, jax.lax.stop_gradient(teacher)).astype(jnp.float32)
                loss = loss + cfg.mesa * jax.lax.cond(
                    state.step >= cfg.mesa_start_step, kd,
                    lambda _: jnp.zeros((), jnp.float32), None)
            return loss, (logits, mut["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema_p, new_ema_bs = state.ema_params, state.ema_batch_stats
        if cfg.use_ema and state.ema_params is not None:
            new_ema_p = ema_update(state.ema_params, new_params, cfg.ema_decay)
            new_ema_bs = ema_update(state.ema_batch_stats, new_bs, cfg.ema_decay)

        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        if schedule_fn is not None:
            metrics["lr"] = schedule_fn(state.step)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt,
                                  ema_params=new_ema_p, ema_batch_stats=new_ema_bs)
        return new_state, metrics

    return train_step


def make_eval_step(module):
    """eval_step(variables, batch) -> metrics with summed correct counts
    (caller divides by total count; global under a sharded jit). Respects an
    optional boolean 'valid' mask for padded final batches."""
    def eval_step(variables, batch):
        logits = module.apply(variables, batch["image"])
        labels = batch["label"]
        valid = batch.get("valid", jnp.ones(labels.shape, bool))
        per_ex = -jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                                      labels[:, None], axis=-1)[:, 0]
        top1 = ((jnp.argmax(logits, -1) == labels) & valid).sum()
        k = min(5, logits.shape[-1])
        top5 = ((jax.lax.top_k(logits, k)[1] == labels[:, None]).any(-1)
                & valid).sum()
        return {"loss_sum": jnp.where(valid, per_ex, 0.0).sum(), "top1": top1,
                "top5": top5, "count": valid.sum()}
    return eval_step
