"""Int8 on-chip probe: (1) raw s8xs8->s32 vs bf16 matmul rate at the large
variants' MLP shapes, (2) logit agreement int8 vs bf16 on-chip for fv5.

Settles whether the int8 serving path (ops/quant.py) pays at fv5/fv6
scale — the earlier "int8 <=15%" note was an estimate for fv0-class
narrow-K (256-1024) shapes; fv5/fv6 MLPs run K=1280-2560, N up to 10240,
where the MXU is flop-bound (ROOFLINE.json: 47-49% MFU bf16).

Usage: python scripts/bench_int8_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _bench(fn, *args, iters=30):
    s = jnp.zeros((), jnp.float32)

    @jax.jit
    def chained(s, *a):
        out = fn(*a)
        return s + out.astype(jnp.float32).ravel()[0]

    s = chained(s, *args)
    float(s)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        s = chained(s, *args)
    float(s)
    return (time.perf_counter() - t0) / iters


def matmul_probe():
    rs = np.random.RandomState(0)
    # fv5 stage-3 MLP fc1 at batch 32: tokens = 32*49 windows... use the
    # aggregate GEMM the model actually issues: (B*S, K) x (K, N)
    shapes = [
        (1568, 2560, 10240, "fv5 st3 mlp.fc1 b32"),
        (6272, 1280, 5120, "fv5 st2 mlp.fc1 b32"),
        (1568, 2560, 7680, "fv5 st3 qkv b32"),
        (8192, 4096, 4096, "square 4k"),
    ]
    for m, k, n, label in shapes:
        a = jnp.asarray(rs.randn(m, k), jnp.bfloat16)
        b = jnp.asarray(rs.randn(k, n), jnp.bfloat16)
        t_bf16 = _bench(lambda a, b: a @ b, a, b)
        ai = jnp.asarray(rs.randint(-127, 127, (m, k)), jnp.int8)
        bi = jnp.asarray(rs.randint(-127, 127, (k, n)), jnp.int8)
        t_int8 = _bench(
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32), ai, bi)
        fl = 2 * m * k * n
        print(f"{label}: bf16 {t_bf16*1e3:.2f}ms ({fl/t_bf16/1e12:.1f} TF/s) "
              f"int8 {t_int8*1e3:.2f}ms ({fl/t_int8/1e12:.1f} TOP/s) "
              f"speedup {t_bf16/t_int8:.2f}x", flush=True)


def model_probe(name="faster_vit_5_224", batch=32, res=224):
    import fastervit_tpu as fvt
    from fastervit_tpu.ops.quant import quantize_variables, quantized_call

    model = fvt.create_model(name, dtype=jnp.bfloat16)
    variables = jax.jit(model.module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)))
    x = jnp.asarray(np.random.RandomState(0).randn(batch, res, res, 3),
                    jnp.bfloat16)
    t_bf16 = _bench(lambda v, x: model.module.apply(v, x), variables, x)

    mq = fvt.create_model(name, dtype=jnp.bfloat16, quantized=True)
    vq = jax.jit(quantize_variables)(variables)
    t_int8 = _bench(lambda v, x: quantized_call(mq.module.apply, v, x),
                    vq, x)
    y0 = np.asarray(model.module.apply(variables, x), np.float32)
    yq = np.asarray(quantized_call(mq.module.apply, vq, x), np.float32)
    cos = float((y0 * yq).sum() /
                (np.linalg.norm(y0) * np.linalg.norm(yq) + 1e-12))
    agree = float((y0.argmax(-1) == yq.argmax(-1)).mean())
    print(f"{name} b{batch}: bf16 {batch/t_bf16:.0f} img/s, "
          f"int8 {batch/t_int8:.0f} img/s, speedup {t_bf16/t_int8:.2f}x, "
          f"cosine {cos:.5f}, top1-agree {agree:.3f}", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    matmul_probe()
    for nm, b in [("faster_vit_5_224", 64), ("faster_vit_6_224", 64),
                  ("faster_vit_4_224", 64), ("faster_vit_1_224", 256)]:
        model_probe(nm, b)
