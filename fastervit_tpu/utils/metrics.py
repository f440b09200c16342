"""Meters, CSV summaries, TensorBoard logging (reference train.py:814-817
AverageMeter usage, :783-786 summary.csv, tensorboard.py:4-25)."""
from __future__ import annotations

import csv
import os
from collections import OrderedDict
from typing import Optional


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


def update_summary(epoch: int, train_metrics: dict, eval_metrics: dict,
                   filename: str, write_header: bool = False):
    """Append a row to summary.csv (timm update_summary semantics)."""
    row = OrderedDict(epoch=epoch)
    row.update([("train_" + k, v) for k, v in train_metrics.items()])
    row.update([("eval_" + k, v) for k, v in eval_metrics.items()])
    with open(filename, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row.keys()))
        if write_header:
            w.writeheader()
        w.writerow(row)


class WandbLogger:
    """Optional Weights & Biases logging, import-gated exactly like the
    reference (train.py:383-388: missing wandb -> warning, training
    continues)."""

    def __init__(self, enabled: bool, project: str = "fastervit-tpu",
                 run_name: Optional[str] = None, config: Optional[dict] = None):
        self._wandb = None
        if not enabled:
            return
        try:
            import wandb
            wandb.init(project=project, name=run_name, config=config)
            self._wandb = wandb
        except ImportError:
            import logging
            logging.getLogger(__name__).warning(
                "wandb requested but not installed; metrics will not be "
                "logged to wandb (pip install wandb)")

    def log(self, metrics: dict, step: Optional[int] = None):
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()


class TensorboardLogger:
    """Scalar logger (reference tensorboard.py TensorboardLogger), backed by
    tf.summary when tensorflow is available, else a no-op."""

    def __init__(self, log_dir: Optional[str]):
        self._writer = None
        if log_dir:
            try:
                import tensorflow as tf
                os.makedirs(log_dir, exist_ok=True)
                self._writer = tf.summary.create_file_writer(log_dir)
            except ImportError:
                pass

    def log_scalar(self, tag: str, value: float, step: int):
        if self._writer is None:
            return
        import tensorflow as tf
        with self._writer.as_default():
            tf.summary.scalar(tag, value, step=step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()
