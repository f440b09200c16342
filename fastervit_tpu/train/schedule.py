"""Iteration-based LR schedules matching the reference's vendored timm fork
(/root/reference/fastervit/scheduler/): cosine (cycles + k-decay), tanh, step,
multistep, poly — all as pure step->lr functions pluggable into optax.

The reference steps its scheduler per *iteration* by default, converting
epochs to iterations via data_len // global_batch
(scheduler_factory.py:12-16, train.py:332,849-850). `create_scheduler`
reproduces that conversion.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Sequence

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _warmup(t, base_lr, warmup_t, warmup_lr_init):
    """Linear warmup from warmup_lr_init to base_lr over warmup_t steps
    (scheduler/cosine_lr.py:66-75)."""
    step = (base_lr - warmup_lr_init) / warmup_t
    return warmup_lr_init + t * step


def cosine_schedule(base_lr: float, t_initial: int, lr_min: float = 0.0,
                    cycle_mul: float = 1.0, cycle_decay: float = 1.0,
                    cycle_limit: int = 1, warmup_t: int = 0,
                    warmup_lr_init: float = 0.0, warmup_prefix: bool = False,
                    k_decay: float = 1.0) -> Schedule:
    """timm CosineLRScheduler semantics (scheduler/cosine_lr.py:73-102).

    Note warmup_prefix=False (the reference default): the cosine phase is
    indexed by the *total* step count, so warmup overlaps the cosine's head.
    """
    def fn(step):
        t = jnp.asarray(step, jnp.float32)

        def cosine(t):
            if warmup_prefix:
                t = t - warmup_t
            if cycle_mul != 1.0:
                i = jnp.floor(jnp.log(1 - t / t_initial * (1 - cycle_mul)) /
                              math.log(cycle_mul))
                t_i = cycle_mul ** i * t_initial
                t_curr = t - (1 - cycle_mul ** i) / (1 - cycle_mul) * t_initial
            else:
                i = t // t_initial
                t_i = t_initial
                t_curr = t - t_initial * i
            lr_max = base_lr * cycle_decay ** i
            lr = lr_min + 0.5 * (lr_max - lr_min) * (
                1 + jnp.cos(jnp.pi * t_curr ** k_decay / t_i ** k_decay))
            return jnp.where(i < cycle_limit, lr, lr_min)

        if warmup_t > 0:
            return jnp.where(t < warmup_t,
                             _warmup(t, base_lr, warmup_t, warmup_lr_init),
                             cosine(t))
        return cosine(t)

    return fn


def tanh_schedule(base_lr: float, t_initial: int, lr_min: float = 0.0,
                  lb: float = -7.0, ub: float = 3.0, cycle_mul: float = 1.0,
                  cycle_decay: float = 1.0, cycle_limit: int = 1,
                  warmup_t: int = 0, warmup_lr_init: float = 0.0,
                  warmup_prefix: bool = False) -> Schedule:
    """timm TanhLRScheduler semantics (scheduler/tanh_lr.py)."""
    def fn(step):
        t = jnp.asarray(step, jnp.float32)

        def tanh(t):
            if warmup_prefix:
                t = t - warmup_t
            if cycle_mul != 1.0:
                i = jnp.floor(jnp.log(1 - t / t_initial * (1 - cycle_mul)) /
                              math.log(cycle_mul))
                t_i = cycle_mul ** i * t_initial
                t_curr = t - (1 - cycle_mul ** i) / (1 - cycle_mul) * t_initial
            else:
                i = t // t_initial
                t_i = t_initial
                t_curr = t - t_initial * i
            lr_max = base_lr * cycle_decay ** i
            tr = t_curr / t_i
            lr = lr_min + 0.5 * (lr_max - lr_min) * (
                1 - jnp.tanh(lb * (1.0 - tr) + ub * tr))
            return jnp.where(i < cycle_limit, lr, lr_min)

        if warmup_t > 0:
            return jnp.where(t < warmup_t,
                             _warmup(t, base_lr, warmup_t, warmup_lr_init),
                             tanh(t))
        return tanh(t)

    return fn


def step_schedule(base_lr: float, decay_t: int, decay_rate: float = 1.0,
                  warmup_t: int = 0, warmup_lr_init: float = 0.0) -> Schedule:
    """timm StepLRScheduler (scheduler/step_lr.py): lr = base * rate^(t//decay_t)."""
    def fn(step):
        t = jnp.asarray(step, jnp.float32)
        lr = base_lr * decay_rate ** (t // decay_t)
        if warmup_t > 0:
            return jnp.where(t < warmup_t,
                             _warmup(t, base_lr, warmup_t, warmup_lr_init), lr)
        return lr
    return fn


def multistep_schedule(base_lr: float, decay_t: Sequence[int],
                       decay_rate: float = 1.0, warmup_t: int = 0,
                       warmup_lr_init: float = 0.0) -> Schedule:
    """timm MultiStepLRScheduler: decay at each milestone."""
    milestones = jnp.asarray(sorted(decay_t), jnp.float32)

    def fn(step):
        t = jnp.asarray(step, jnp.float32)
        n = jnp.sum(t >= milestones)  # bisect_right for t+1? timm uses bisect_right(t)
        lr = base_lr * decay_rate ** n
        if warmup_t > 0:
            return jnp.where(t < warmup_t,
                             _warmup(t, base_lr, warmup_t, warmup_lr_init), lr)
        return lr
    return fn


def poly_schedule(base_lr: float, t_initial: int, power: float = 0.5,
                  lr_min: float = 0.0, cycle_mul: float = 1.0,
                  cycle_decay: float = 1.0, cycle_limit: int = 1,
                  warmup_t: int = 0, warmup_lr_init: float = 0.0,
                  k_decay: float = 1.0) -> Schedule:
    """timm PolyLRScheduler (scheduler/poly_lr.py)."""
    def fn(step):
        t = jnp.asarray(step, jnp.float32)

        def poly(t):
            if cycle_mul != 1.0:
                i = jnp.floor(jnp.log(1 - t / t_initial * (1 - cycle_mul)) /
                              math.log(cycle_mul))
                t_i = cycle_mul ** i * t_initial
                t_curr = t - (1 - cycle_mul ** i) / (1 - cycle_mul) * t_initial
            else:
                i = t // t_initial
                t_i = t_initial
                t_curr = t - t_initial * i
            lr_max = base_lr * cycle_decay ** i
            lr = lr_min + (lr_max - lr_min) * (
                1 - t_curr ** k_decay / t_i ** k_decay) ** power
            return jnp.where(i < cycle_limit, lr, lr_min)

        if warmup_t > 0:
            return jnp.where(t < warmup_t,
                             _warmup(t, base_lr, warmup_t, warmup_lr_init),
                             poly(t))
        return poly(t)

    return fn


class PlateauScheduler:
    """Reduce-on-plateau (timm PlateauLRScheduler semantics, reference
    scheduler/plateau_lr.py): stateful host-side controller — call
    step(epoch, metric) each epoch and use .lr. Not a pure step->lr fn
    because it depends on the metric stream."""

    def __init__(self, base_lr: float, decay_rate: float = 0.1,
                 patience_t: int = 10, lr_min: float = 0.0,
                 mode: str = "max", threshold: float = 1e-4,
                 cooldown_t: int = 0, warmup_t: int = 0,
                 warmup_lr_init: float = 0.0):
        self.lr = base_lr if warmup_t == 0 else warmup_lr_init
        self.base_lr = base_lr
        self.decay_rate = decay_rate
        self.patience_t = patience_t
        self.lr_min = lr_min
        self.mode = mode
        self.threshold = threshold
        self.cooldown_t = cooldown_t
        self.warmup_t = warmup_t
        self.warmup_lr_init = warmup_lr_init
        self._best = None
        self._bad_epochs = 0
        self._cooldown = 0

    def _improved(self, metric):
        if self._best is None:
            return True
        if self.mode == "max":
            return metric > self._best + self.threshold
        return metric < self._best - self.threshold

    def step(self, epoch: int, metric: float) -> float:
        if epoch < self.warmup_t:
            frac = (epoch + 1) / max(1, self.warmup_t)
            self.lr = self.warmup_lr_init + frac * (self.base_lr
                                                    - self.warmup_lr_init)
            return self.lr
        if self._improved(metric):
            self._best = metric
            self._bad_epochs = 0
        elif self._cooldown > 0:
            self._cooldown -= 1
        else:
            self._bad_epochs += 1
            if self._bad_epochs > self.patience_t:
                self.lr = max(self.lr * self.decay_rate, self.lr_min)
                self._bad_epochs = 0
                self._cooldown = self.cooldown_t
        return self.lr


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    """Mirror of the reference's scheduler flags (train.py:255-286, 330-335)."""
    sched: str = "cosine"
    lr: float = 5e-3
    min_lr: float = 5e-6
    warmup_lr: float = 1e-6
    epochs: int = 310
    warmup_epochs: int = 20
    cooldown_epochs: int = 10
    data_len: int = 1281167
    batch_size: int = 128
    world_size: int = 1
    decay_epochs: int = 100
    decay_milestones: tuple = (30, 60)
    decay_rate: float = 0.1
    lr_cycle_mul: float = 1.0
    lr_cycle_decay: float = 0.1
    lr_cycle_limit: int = 1
    lr_k_decay: float = 1.0


def create_scheduler(cfg: ScheduleConfig):
    """Reference scheduler_factory.create_scheduler semantics
    (scheduler_factory.py:12-111): epochs -> iterations, returns
    (schedule_fn, total_train_iterations_incl_cooldown)."""
    n_iter = cfg.data_len // (cfg.batch_size * cfg.world_size)
    tot_iter = cfg.epochs * n_iter
    warmup_iters = cfg.warmup_epochs * n_iter
    cycle = dict(cycle_mul=cfg.lr_cycle_mul, cycle_decay=cfg.lr_cycle_decay,
                 cycle_limit=cfg.lr_cycle_limit)
    if cfg.sched == "cosine":
        fn = cosine_schedule(cfg.lr, tot_iter, lr_min=cfg.min_lr,
                             warmup_t=warmup_iters, warmup_lr_init=cfg.warmup_lr,
                             k_decay=cfg.lr_k_decay, **cycle)
        if cfg.lr_cycle_mul == 1.0:
            cycle_iters = tot_iter * max(1, cfg.lr_cycle_limit)
        else:
            cycle_iters = int(math.floor(
                -tot_iter * (cfg.lr_cycle_mul ** max(1, cfg.lr_cycle_limit) - 1)
                / (1 - cfg.lr_cycle_mul)))
        total = cycle_iters + cfg.cooldown_epochs * n_iter
    elif cfg.sched == "tanh":
        fn = tanh_schedule(cfg.lr, tot_iter, lr_min=cfg.min_lr,
                           warmup_t=warmup_iters, warmup_lr_init=cfg.warmup_lr,
                           **cycle)
        total = tot_iter + cfg.cooldown_epochs * n_iter
    elif cfg.sched == "step":
        fn = step_schedule(cfg.lr, cfg.decay_epochs * n_iter, cfg.decay_rate,
                           warmup_t=warmup_iters, warmup_lr_init=cfg.warmup_lr)
        total = tot_iter
    elif cfg.sched == "multistep":
        fn = multistep_schedule(cfg.lr, [m * n_iter for m in cfg.decay_milestones],
                                cfg.decay_rate, warmup_t=warmup_iters,
                                warmup_lr_init=cfg.warmup_lr)
        total = tot_iter
    elif cfg.sched == "poly":
        fn = poly_schedule(cfg.lr, tot_iter, power=cfg.decay_rate,
                           lr_min=cfg.min_lr, warmup_t=warmup_iters,
                           warmup_lr_init=cfg.warmup_lr, k_decay=cfg.lr_k_decay,
                           **cycle)
        total = tot_iter + cfg.cooldown_epochs * n_iter
    else:
        raise ValueError(f"unknown schedule {cfg.sched!r}")
    return fn, total
