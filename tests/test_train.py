"""Training-step tests on the virtual 8-device CPU mesh: full train step
(mixup + MESA + EMA + adamw) under batch sharding, loss decreases, BN stats
update, schedules match the reference's vendored timm schedulers."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fastervit_tpu as fvt
from fastervit_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from fastervit_tpu.train.mixup import MixupConfig, mixup_cutmix
from fastervit_tpu.train.schedule import ScheduleConfig, cosine_schedule, create_scheduler
from fastervit_tpu.train.steps import (TrainConfig, create_optimizer,
                                       create_train_state, make_eval_step,
                                       make_train_step)


def _tiny_model(num_classes=10):
    return fvt.create_model("faster_vit_0_224", depths=[1, 1, 1, 1],
                            num_heads=[1, 2, 4, 8], dim=32, in_dim=16,
                            resolution=112, num_classes=num_classes)


def test_sharded_train_step_runs_and_learns(cpu_devices):
    mesh = create_mesh(cpu_devices)
    model = _tiny_model()
    cfg = TrainConfig(mesa=0.2, mesa_start_step=1, use_ema=True,
                      mixup=MixupConfig(num_classes=10))
    sched, _ = create_scheduler(ScheduleConfig(
        epochs=2, warmup_epochs=0, cooldown_epochs=0, data_len=1024,
        batch_size=16, lr=1e-3))
    tx = create_optimizer(sched, cfg)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.randn(16, 112, 112, 3), jnp.float32),
             "label": jnp.asarray(np.arange(16) % 10, jnp.int32)}
    repl, bsh = replicated(mesh), batch_sharding(mesh)
    with mesh:
        state = jax.device_put(state, repl)
        batch = jax.device_put(batch, bsh)
        step = jax.jit(make_train_step(model.module, tx, cfg, sched),
                       in_shardings=(repl, bsh, repl))
        losses = []
        for i in range(4):
            state, m = step(state, batch, jax.random.PRNGKey(42))
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses)), losses
        assert losses[-1] < losses[0], losses  # same batch -> must overfit
        assert int(state.step) == 4
        # EMA must have moved from init but stayed close (decay 0.9998)
        p0 = jax.tree.leaves(state.params)[0]
        e0 = jax.tree.leaves(state.ema_params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(e0))

        ev = jax.jit(make_eval_step(model.module), in_shardings=(repl, bsh))
        em = ev({"params": state.params, "batch_stats": state.batch_stats}, batch)
        assert int(em["count"]) == 16
        assert 0 <= int(em["top1"]) <= 16


def test_batchnorm_stats_are_global_batch(cpu_devices):
    """Batch-sharded jit must yield the same BN statistics as single-device
    execution — the GSPMD replacement for SyncBN (train.py:467-478)."""
    mesh = create_mesh(cpu_devices)
    model = _tiny_model()
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(16, 112, 112, 3), jnp.float32)

    def fwd(v, x):
        return model.module.apply(v, x, training=True, mutable=["batch_stats"],
                                  rngs={"dropout": jax.random.PRNGKey(0)})

    _, single = jax.jit(fwd)(variables, x)
    with mesh:
        _, sharded = jax.jit(fwd, in_shardings=(replicated(mesh),
                                                batch_sharding(mesh)))(variables, x)
    a = jax.tree.leaves(single["batch_stats"])
    b = jax.tree.leaves(sharded["batch_stats"])
    for s, t in zip(a, b):
        np.testing.assert_allclose(np.asarray(s), np.asarray(t), atol=1e-5)


def test_cosine_schedule_matches_reference_vendored_timm():
    """Golden test against the reference's own scheduler fork
    (/root/reference/fastervit/scheduler/cosine_lr.py) — importable without
    timm."""
    import importlib.util
    import types

    import torch

    # the vendored package's multistep_lr pulls timm.scheduler.scheduler's
    # base class; point the stub at the vendored base (same class)
    spec = importlib.util.spec_from_file_location(
        "_ref_sched_base", "/root/reference/fastervit/scheduler/scheduler.py")
    base = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(base)
    timm = sys.modules.setdefault("timm", types.ModuleType("timm"))
    tsch = types.ModuleType("timm.scheduler")
    tschs = types.ModuleType("timm.scheduler.scheduler")
    tschs.Scheduler = base.Scheduler
    tsch.scheduler = tschs
    timm.scheduler = tsch
    sys.modules.setdefault("timm.scheduler", tsch)
    sys.modules.setdefault("timm.scheduler.scheduler", tschs)

    sys.path.insert(0, "/root/reference/fastervit")
    from scheduler.cosine_lr import CosineLRScheduler

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.005)
    ref = CosineLRScheduler(opt, t_initial=1000, lr_min=5e-6,
                            warmup_lr_init=1e-6, warmup_t=100,
                            t_in_epochs=False, k_decay=1.0)
    ours = cosine_schedule(0.005, 1000, lr_min=5e-6, warmup_t=100,
                           warmup_lr_init=1e-6)
    for t in [0, 1, 50, 99, 100, 101, 500, 999, 1000, 1100]:
        expect = ref._get_lr(t)[0]
        got = float(ours(t))
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-9,
                                   err_msg=f"t={t}")


def test_mixup_cutmix_targets_sum_to_one():
    cfg = MixupConfig(num_classes=10)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 32, 32, 3), jnp.float32)
    y = jnp.asarray(np.arange(8) % 10, jnp.int32)
    for seed in range(5):
        xm, tm = mixup_cutmix(jax.random.PRNGKey(seed), x, y, cfg)
        assert xm.shape == x.shape
        np.testing.assert_allclose(np.asarray(tm.sum(-1)), 1.0, atol=1e-5)
        assert np.asarray(tm).min() >= 0.0


def test_plateau_scheduler():
    from fastervit_tpu.train.schedule import PlateauScheduler
    s = PlateauScheduler(0.1, decay_rate=0.5, patience_t=1, warmup_t=2,
                         warmup_lr_init=0.01)
    assert abs(s.step(0, 0.0) - 0.055) < 1e-9   # warmup midpoint
    assert abs(s.step(1, 0.0) - 0.1) < 1e-9
    s.step(2, 1.0)              # best
    s.step(3, 1.0)              # bad 1 (<= patience)
    assert s.lr == 0.1
    s.step(4, 1.0)              # bad 2 -> decay
    assert abs(s.lr - 0.05) < 1e-9
    s.step(5, 2.0)              # improvement resets
    assert abs(s.lr - 0.05) < 1e-9


def test_jsd_loss_zero_consistency_when_identical():
    from fastervit_tpu.train.losses import (jsd_cross_entropy,
                                            label_smoothing_cross_entropy)
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 10), jnp.float32)
    labels = jnp.asarray([1, 2, 3, 4])
    jsd = jsd_cross_entropy([logits, logits, logits], labels)
    ce = label_smoothing_cross_entropy(logits, labels)
    np.testing.assert_allclose(float(jsd), float(ce), rtol=1e-5)
    # diverging splits cost more
    other = jnp.asarray(rng.randn(4, 10) * 3, jnp.float32)
    assert float(jsd_cross_entropy([logits, other, logits], labels)) > float(ce)
