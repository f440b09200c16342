"""ImageNet training loop (reference fastervit/train.py:379-951, TPU-native).

YAML config sets defaults, CLI overrides (reference two-stage parsing,
train.py:75-77, 363-377). One process drives the whole mesh: batch-sharded
jit subsumes DDP, SyncBN and metric all-reduce. Orbax checkpoints, EMA +
MESA, NaN guard, summary.csv + TensorBoard.

    python -m fastervit_tpu.train --config configs/faster_vit_0_224_1k.yaml \
        --data-dir /data/imagenet --output out/
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastervit_tpu.models.registry import create_model
from fastervit_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from fastervit_tpu.train.mixup import MixupConfig
from fastervit_tpu.train.schedule import ScheduleConfig, create_scheduler
from fastervit_tpu.train.steps import (TrainConfig, create_optimizer,
                                       create_train_state, make_eval_step,
                                       make_train_step)
from fastervit_tpu.utils.metrics import AverageMeter, TensorboardLogger, update_summary

log = logging.getLogger("fastervit_tpu.train")


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", default="", help="YAML config with defaults")
    p.add_argument("--model", default="faster_vit_0_224")
    p.add_argument("--model-kwargs", default="",
                   help="JSON kwargs forwarded to create_model "
                        "(e.g. '{\"resolution\": 288}')")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--lmdb-dataset", action="store_true",
                   help="LMDB-backed ImageNet (reference --lmdb_dataset, utils/datasets.py:458-498)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("-b", "--batch-size", type=int, default=128,
                   help="per-host global batch (sharded over the mesh)")
    p.add_argument("--epochs", type=int, default=310)
    p.add_argument("--warmup-epochs", type=int, default=20)
    p.add_argument("--cooldown-epochs", type=int, default=10)
    p.add_argument("--sched", default="cosine")
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--min-lr", type=float, default=5e-6)
    p.add_argument("--warmup-lr", type=float, default=1e-6)
    p.add_argument("--data-len", type=int, default=1281167)
    p.add_argument("--opt", default="adamw")
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--clip-grad", type=float, default=5.0)
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--bce-loss", action="store_true")
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--mixup-prob", type=float, default=1.0)
    p.add_argument("--mixup-switch-prob", type=float, default=0.5)
    p.add_argument("--mixup-off-epoch", type=int, default=0)
    p.add_argument("--model-ema", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--model-ema-decay", type=float, default=0.9998)
    p.add_argument("--mesa", type=float, default=0.0)
    p.add_argument("--mesa-start-ratio", type=float, default=0.25)
    p.add_argument("--drop-path", type=float, default=None)
    p.add_argument("--grad-checkpointing", action="store_true")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--resume", default="")
    p.add_argument("--auto-resume", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="restore the newest checkpoint in the output dir on "
                        "start (requeue/preemption relaunch flow)")
    p.add_argument("--loadcheckpoint", default="",
                   help="warm start: shape-filtered torch/orbax weights")
    p.add_argument("--output", default="./output")
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--recovery-interval", type=int, default=0)
    p.add_argument("--checkpoint-hist", type=int, default=1)
    p.add_argument("--eval-metric", default="top1")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--log-wandb", action="store_true",
                   help="log metrics to Weights & Biases if installed "
                        "(reference train.py:383-388)")
    p.add_argument("--experiment", default="",
                   help="wandb run name (reference train.py:306-308)")
    return p


def parse_args(argv=None):
    """YAML-sets-defaults, CLI-overrides (reference train.py:363-377)."""
    parser = build_argparser()
    args, remaining = parser.parse_known_args(argv)
    if args.config:
        import yaml
        with open(args.config) as f:
            cfg = yaml.safe_load(f)
        known = {a.dest for a in parser._actions}
        parser.set_defaults(**{k: v for k, v in cfg.items() if k in known})
        args = parser.parse_args(argv)
    return args


def _make_loaders(args, data_cfg):
    if args.synthetic or not args.data_dir:
        from fastervit_tpu.data.imagenet import SyntheticLoader
        steps = max(args.data_len // args.batch_size, 1)
        train_loader = SyntheticLoader(data_cfg, args.batch_size,
                                       num_batches=min(steps, 32),
                                       num_classes=args.num_classes)
        eval_loader = SyntheticLoader(data_cfg, args.batch_size, num_batches=4,
                                      num_classes=args.num_classes, seed=1)
        return train_loader, eval_loader
    from fastervit_tpu.data.imagenet import EvalLoader
    from fastervit_tpu.data.train_loader import TrainLoader
    train_loader = TrainLoader(os.path.join(args.data_dir, "train"), data_cfg,
                               args.batch_size, seed=args.seed,
                               use_lmdb=args.lmdb_dataset)
    eval_loader = EvalLoader(os.path.join(args.data_dir, "val"), data_cfg,
                             args.batch_size, use_lmdb=args.lmdb_dataset)
    return train_loader, eval_loader


def _snapshot_code(output_dir: str) -> None:
    """Copy the package's .py sources into output/code_copy (reference
    train.py:723-731) for exact-run reproducibility."""
    import shutil

    import fastervit_tpu
    src = os.path.dirname(fastervit_tpu.__file__)
    dst = os.path.join(output_dir, "code_copy")
    shutil.copytree(src, dst, dirs_exist_ok=True,
                    ignore=shutil.ignore_patterns("__pycache__"))


def train(args) -> dict:
    os.makedirs(args.output, exist_ok=True)
    _snapshot_code(args.output)
    mesh = create_mesh()
    dtype = getattr(jnp, args.dtype)
    overrides = {"num_classes": args.num_classes}
    if args.drop_path is not None:
        overrides["drop_path_rate"] = args.drop_path
    if args.model_kwargs:
        import json
        overrides.update(json.loads(args.model_kwargs))
    model = create_model(args.model, dtype=dtype, **overrides)

    sched_cfg = ScheduleConfig(
        sched=args.sched, lr=args.lr, min_lr=args.min_lr,
        warmup_lr=args.warmup_lr, epochs=args.epochs,
        warmup_epochs=args.warmup_epochs, cooldown_epochs=args.cooldown_epochs,
        data_len=args.data_len, batch_size=args.batch_size, world_size=1)
    schedule_fn, total_iters = create_scheduler(sched_cfg)
    steps_per_epoch = max(args.data_len // args.batch_size, 1)
    num_epochs = math.ceil(total_iters / steps_per_epoch)

    mixup = None
    if args.mixup > 0 or args.cutmix > 0:
        mixup = MixupConfig(mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
                            prob=args.mixup_prob,
                            switch_prob=args.mixup_switch_prob,
                            label_smoothing=args.smoothing,
                            num_classes=args.num_classes)
    tcfg = TrainConfig(
        clip_grad=args.clip_grad, weight_decay=args.weight_decay, opt=args.opt,
        ema_decay=args.model_ema_decay, use_ema=args.model_ema,
        smoothing=args.smoothing, bce_loss=args.bce_loss, mixup=mixup,
        mesa=args.mesa,
        mesa_start_step=int(args.mesa_start_ratio * args.epochs * steps_per_epoch),
        grad_checkpoint=args.grad_checkpointing)
    tx = create_optimizer(schedule_fn, tcfg)
    state = create_train_state(model, tx, jax.random.PRNGKey(args.seed), tcfg)

    if args.loadcheckpoint:
        # shape-filtered warm start (reference train.py:527-540)
        variables = model.load_pytorch(args.loadcheckpoint)
        state = state.replace(params=variables["params"],
                              batch_stats=variables.get("batch_stats",
                                                        state.batch_stats))

    from fastervit_tpu.utils.checkpoint import CheckpointManager
    ckpt = CheckpointManager(os.path.join(args.output, "checkpoints"),
                             max_history=args.checkpoint_hist,
                             recovery_interval=args.recovery_interval)
    if args.resume:
        restored = CheckpointManager(args.resume).restore(state)
        if restored is not None:
            state = restored
            log.info("resumed at step %d", int(state.step))
    else:
        # requeue relaunch: auto-restore the newest checkpoint in output/
        # (reference run_with_submitit.py:13-50 + train.py:505-516)
        from fastervit_tpu.utils.preemption import maybe_auto_resume
        state, _ = maybe_auto_resume(ckpt, state, args.auto_resume)

    train_loader, eval_loader = _make_loaders(args, model.cfg.data)

    repl, bsh = replicated(mesh), batch_sharding(mesh)
    train_step = jax.jit(make_train_step(model.module, tx, tcfg, schedule_fn),
                         in_shardings=(repl, bsh, repl), donate_argnums=(0,))
    # mixup disabled for the final epochs (reference --mixup-off-epoch,
    # train.py:825-829): a second jitted step without mixup
    train_step_nomix = None
    if args.mixup_off_epoch and mixup is not None:
        tcfg_off = dataclasses.replace(tcfg, mixup=None)
        train_step_nomix = jax.jit(
            make_train_step(model.module, tx, tcfg_off, schedule_fn),
            in_shardings=(repl, bsh, repl), donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(model.module), in_shardings=(repl, bsh))
    tb = TensorboardLogger(os.path.join(args.output, "tb")
                           if args.tensorboard else None)
    from fastervit_tpu.utils.metrics import WandbLogger
    wandb_log = WandbLogger(getattr(args, "log_wandb", False),
                            run_name=args.experiment or None,
                            config=vars(args))

    def run_eval(params, batch_stats):
        totals = {"loss_sum": 0.0, "top1": 0, "top5": 0, "count": 0}
        for batch in eval_loader:
            b = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch.items()}
            m = jax.tree.map(lambda x: x.item(),
                             eval_step({"params": params,
                                        "batch_stats": batch_stats}, b))
            for k in totals:
                totals[k] += m[k]
        n = max(totals["count"], 1)
        return {"loss": totals["loss_sum"] / n,
                "top1": 100.0 * totals["top1"] / n,
                "top5": 100.0 * totals["top5"] / n}

    best = -float("inf")
    summary_path = os.path.join(args.output, "summary.csv")
    rng = jax.random.PRNGKey(args.seed)
    from fastervit_tpu.utils.preemption import PreemptionHandler
    preempt = PreemptionHandler().install()
    with mesh:
        state = jax.device_put(state, repl)
        for epoch in range(num_epochs):
            step_fn = train_step
            if (train_step_nomix is not None
                    and epoch >= num_epochs - args.mixup_off_epoch):
                step_fn = train_step_nomix
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            loss_m, rate_m = AverageMeter(), AverageMeter()
            t_end = time.perf_counter()
            for i, batch in enumerate(train_loader):
                b = {k: jax.device_put(jnp.asarray(v), bsh)
                     for k, v in batch.items() if k != "valid"}
                state, metrics = step_fn(state, b, rng)
                if preempt.preempted:
                    # SIGTERM/SIGUSR1: save synchronously, exit 75 so the
                    # launcher requeues; next run auto-resumes from here
                    preempt.checkpoint_and_exit(ckpt, int(state.step), state)
                if i % args.log_interval == 0:
                    metrics = jax.tree.map(lambda x: x.item(), metrics)
                    if not np.isfinite(metrics["loss"]):
                        # NaN guard (reference train.py:794-810)
                        log.error("non-finite loss at epoch %d it %d: %s",
                                  epoch, i, metrics)
                        raise FloatingPointError("training loss is non-finite")
                    dt = time.perf_counter() - t_end
                    rate = args.batch_size * (1 if i == 0 else args.log_interval) / dt
                    loss_m.update(metrics["loss"])
                    rate_m.update(rate)
                    log.info("epoch %d it %d/%d loss %.4f lr %.2e %.0f img/s",
                             epoch, i, len(train_loader), metrics["loss"],
                             metrics.get("lr", 0.0), rate)
                    tb.log_scalar("train/loss", metrics["loss"], int(state.step))
                    wandb_log.log({"train/loss": metrics["loss"],
                                   "train/lr": metrics.get("lr", 0.0),
                                   "train/img_s": rate}, step=int(state.step))
                    t_end = time.perf_counter()
                ckpt.maybe_save_recovery(int(state.step), state)

            eval_m = run_eval(state.params, state.batch_stats)
            log.info("epoch %d eval: %s", epoch, eval_m)
            if state.ema_params is not None:
                ema_m = run_eval(state.ema_params, state.ema_batch_stats)
                log.info("epoch %d EMA eval: %s", epoch, ema_m)
                if ema_m["top1"] >= eval_m["top1"]:
                    eval_m = {**ema_m, "ema": 1}
            if not np.isfinite(eval_m["loss"]):
                log.error("eval loss non-finite; aborting (NaN guard)")
                raise FloatingPointError("eval loss is non-finite")
            metric = eval_m[args.eval_metric]
            ckpt.save(int(state.step), jax.device_get(state), metric=metric)
            best = max(best, metric)
            update_summary(epoch, {"loss": loss_m.avg, "img_s": rate_m.avg},
                           eval_m, summary_path, write_header=(epoch == 0))
            tb.log_scalar("eval/top1", eval_m["top1"], int(state.step))
            wandb_log.log({"eval/" + k: v for k, v in eval_m.items()},
                          step=int(state.step))
            tb.flush()
    wandb_log.finish()
    ckpt.wait()
    return {"best_" + args.eval_metric: best}


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    return train(parse_args(argv))


if __name__ == "__main__":
    main()
