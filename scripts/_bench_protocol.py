"""THE chained-scalar-fetch bench protocol, shared by the newer probe
scripts (code-review r5: this was re-implemented four times with subtle
unit/windowing drift — train_step_decomp and attn_online_probe now import
this; profile_cls.bench_chain and profile_downstream.time_fn predate it
and stay as the exact code their committed artifacts were measured with).

Protocol (ROUND_NOTES r1/r4): only a host fetch is a true barrier through
the device relay; iterations chain through a scalar carry so they
serialize; the first measured window is discarded (relay first-executable
cost); the median of the kept windows is returned, in SECONDS per call.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_chained(fn, args, iters=10, windows=4):
    """fn(scalar_carry, *args) -> scalar carry. Returns
    (seconds_per_call, compile_seconds)."""
    f = jax.jit(fn)
    s = jnp.zeros((), jnp.float32)
    t0 = time.time()
    s2 = f(s, *args)
    float(s2)
    compile_s = time.time() - t0
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            s = f(s, *args)
        float(s)
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(sorted(times[1:]))), compile_s
