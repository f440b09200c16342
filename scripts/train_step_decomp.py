"""Where does the fv0 train step's time go? (ROOFLINE_TRAIN follow-up:
26.7% MFU vs 30.3% inference — locate the gap before calling it a limit.)

Differential jit timing at the bench config (fv0, b128, bf16):
  fwd_infer        — inference forward (BN running stats)
  fwd_train        — training forward (BN batch stats + mixup applied)
  fwd_bwd          — value_and_grad of the training loss
  full_step        — the production train step (mixup+clip+adamw+EMA)
Writes TRAIN_DECOMP.json with the implied bwd/optimizer shares.

Usage: python scripts/train_step_decomp.py [--model faster_vit_0_224]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import jax
import jax.numpy as jnp
import numpy as np


from _bench_protocol import bench_chained as timed  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="faster_vit_0_224")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import fastervit_tpu as fvt
    from fastervit_tpu.train.steps import (TrainConfig, create_optimizer,
                                           create_train_state,
                                           make_train_step)

    model = fvt.create_model(args.model, dtype=jnp.bfloat16)
    cfg = TrainConfig()
    tx = create_optimizer(lambda step: 5e-4, cfg)
    state = create_train_state(model, tx, rng=jax.random.PRNGKey(0), cfg=cfg)
    res = model.cfg.resolution[0]
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(args.batch, res, res, 3), jnp.bfloat16)
    y = jnp.asarray(rs.randint(0, 1000, (args.batch,)), jnp.int32)
    yhot = jax.nn.one_hot(y, 1000)
    batch = {"image": x, "label": y}
    rng = jax.random.PRNGKey(1)
    v = {"params": state.params, "batch_stats": state.batch_stats}

    out = {"model": args.model, "batch": args.batch, "dtype": "bfloat16"}

    def rec(name, t, c):
        out[name + "_ms"] = round(t * 1e3, 2)
        print(f"{name:12s} {t * 1e3:8.2f} ms (compile {c:.0f}s)", flush=True)

    t, c = timed(lambda s, v, x: s + model.module.apply(v, x).astype(
        jnp.float32).mean(), (v, x))
    rec("fwd_infer", t, c)

    drng = {"dropout": jax.random.PRNGKey(2)}

    def fwd_train(s, v, x):
        out2, _ = model.module.apply(v, x, training=True, rngs=drng,
                                     mutable=["batch_stats"])
        return s + out2.astype(jnp.float32).mean()

    t, c = timed(fwd_train, (v, x))
    rec("fwd_train", t, c)

    def loss_fn(p, bs, x, yh):
        logits, new = model.module.apply(
            {"params": p, "batch_stats": bs}, x, training=True, rngs=drng,
            mutable=["batch_stats"])
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -(yh * lp).sum(-1).mean(), new

    def fwd_bwd(s, p, bs, x, yh):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, x, yh)
        # full-reduction anchor keeps every dX alive; the ~300 1-element
        # slice variant reproducibly crashes the relay compile helper, and
        # the reductions cost ~0.15 ms (read 120 MB) — noted in the result
        anchor = sum(jnp.sum(t.astype(jnp.float32))
                     for t in jax.tree.leaves(g))
        return s + l + anchor * 1e-12

    t, c = timed(fwd_bwd, (state.params, state.batch_stats, x, yhot))
    rec("fwd_bwd", t, c)

    step_fn = make_train_step(model.module, tx, cfg)

    def full(s, st, b, r):
        st2, m = step_fn(st, b, r)
        # depend on EVERY updated buffer — returning only the loss lets
        # XLA dead-code-eliminate the whole optimizer update (measured:
        # 18 ms vs the real 46 ms step), and anchoring a single leaf
        # still lets it drop the other per-param writes and the EMA tree
        # (code-review r5). One element per leaf keeps each buffer alive
        # at negligible read cost.
        anchor = sum(
            jnp.sum(t.astype(jnp.float32))
            for t in jax.tree.leaves(st2) if hasattr(t, "ravel"))
        return s + m["loss"] + anchor * 1e-12

    t, c = timed(full, (state, batch, rng))
    rec("full_step", t, c)

    out["bwd_implied_ms"] = round(out["fwd_bwd_ms"] - out["fwd_train_ms"], 2)
    out["opt_mixup_ema_implied_ms"] = round(
        out["full_step_ms"] - out["fwd_bwd_ms"], 2)
    out["note"] = ("bwd_implied = fwd_bwd - fwd_train; opt_mixup_ema = "
                   "full_step - fwd_bwd (includes mixup, clip, adamw, EMA, "
                   "metric reductions)")
    with open(os.path.join(REPO, "TRAIN_DECOMP.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote TRAIN_DECOMP.json")


if __name__ == "__main__":
    main()
