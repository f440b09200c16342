"""Named-section timers and cumulative function timing.

Reference patterns: dino/util/time_counter.py:4-32 (TimeCounter / TimeHolder
named-section timers) and motrv2/TrackEval/trackeval/_timing.py:11-35
(decorator-based cumulative timing behind a DO_TIMING flag). The TPU analog
of the reference's profiler story (SURVEY.md §5.1): step-level wall timers
plus an optional jax.profiler trace context (gated — the profiler hangs
through the axon device relay, so it is opt-in).
"""
from __future__ import annotations

import contextlib
import functools
import time
from collections import OrderedDict, defaultdict
from typing import Optional

DO_TIMING = False  # module-level switch for @time_function (TrackEval-style)
_cumulative = defaultdict(float)
_counts = defaultdict(int)


class TimeCounter:
    """Named-section wall timers (reference TimeCounter + TimeHolder)."""

    def __init__(self):
        self.clear()

    def clear(self):
        self.timedict = OrderedDict()
        self.basetime = time.perf_counter()

    @contextlib.contextmanager
    def timeit(self, name: str):
        t0 = time.perf_counter()
        yield
        self.timedict[name] = self.timedict.get(name, 0.0) + (
            time.perf_counter() - t0)

    def tock(self, name: str):
        """Record elapsed-since-previous-mark under `name`."""
        now = time.perf_counter()
        self.timedict[name] = self.timedict.get(name, 0.0) + (now - self.basetime)
        self.basetime = now

    def __str__(self):
        total = sum(self.timedict.values()) or 1.0
        return " ".join(f"{k}:{v:.4f}s({100 * v / total:.1f}%)"
                        for k, v in self.timedict.items())


def time_function(fn):
    """Cumulative per-function timing behind DO_TIMING (TrackEval
    _timing.time decorator semantics)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if not DO_TIMING:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        try:
            return fn(*args, **kwargs)
        finally:
            _cumulative[fn.__qualname__] += time.perf_counter() - t0
            _counts[fn.__qualname__] += 1

    return wrapped


def timing_report() -> str:
    return "\n".join(f"{k}: {_cumulative[k]:.4f}s over {_counts[k]} calls"
                     for k in sorted(_cumulative, key=_cumulative.get,
                                     reverse=True))


def reset_timing():
    _cumulative.clear()
    _counts.clear()


@contextlib.contextmanager
def jax_trace(log_dir: Optional[str]):
    """Optional jax.profiler trace around a block. Pass None to no-op.
    NOTE: hangs through the axon device relay — use only on directly
    attached TPUs."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
