"""Orbax checkpointing: async save, best-metric retention, recovery saves —
the TPU-native replacement for the reference's timm CheckpointSaver + resume
(train.py:505-516, 715-719, 938-940; SURVEY.md §5.4)."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager.

    Keeps `max_history` checkpoints ranked by metric (reference
    CheckpointSaver semantics), plus an always-overwritten `recovery` save
    every `recovery_interval` steps (train.py:938-940).
    """

    def __init__(self, directory: str, max_history: int = 1,
                 metric_mode: str = "max", recovery_interval: int = 0):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_history,
                best_fn=(lambda m: m["metric"]) if max_history else None,
                best_mode=metric_mode,
                enable_async_checkpointing=True,
            ),
        )
        self.recovery_interval = recovery_interval
        self.directory = directory

    def save(self, step: int, state: Any, metric: Optional[float] = None):
        self._mngr.save(step, args=ocp.args.StandardSave(state),
                        metrics={"metric": float(metric if metric is not None
                                                 else 0.0)})

    def maybe_save_recovery(self, step: int, state: Any):
        if self.recovery_interval and step % self.recovery_interval == 0:
            self.save(step, state)

    def restore(self, state_template: Any, step: Optional[int] = None):
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            return None
        return self._mngr.restore(step,
                                  args=ocp.args.StandardRestore(state_template))

    def latest_step(self):
        return self._mngr.latest_step()

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()


def save_variables(directory: str, variables: Any):
    """One-shot save of inference variables ({'params', 'batch_stats'})."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(directory), variables)
    ckptr.wait_until_finished()


def restore_variables(directory: str, model=None, template: Any = None):
    """Restore inference variables; `model` provides the shape template."""
    ckptr = ocp.StandardCheckpointer()
    if template is None and model is not None:
        template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    return ckptr.restore(os.path.abspath(directory), target=template)
