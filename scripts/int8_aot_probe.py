"""Does the int8 deploy path actually amortize XLA's slow int8 compile?
(VERDICT r4 #6 tail: the claim "deploy through export_stablehlo so the
753 s compile is paid once offline" was wired but never measured.)

Two candidate amortization mechanisms, measured on the real chip:

1. StableHLO artifact (utils/export.export_stablehlo): serializes the
   TRACED program. Deserialization is cheap but the backend compile runs
   again on first call — this leg measures exactly how much of the compile
   cost the artifact actually saves (tracing only?).
2. Serialized EXECUTABLE (jax.experimental.serialize_executable): pickles
   the compiled binary; deserialize_and_load should skip compilation
   entirely. If the axon backend supports it, this is the true offline
   path.

Writes INT8_AOT_PROBE.json with wall times for: fresh jit compile,
stablehlo export/load/first-call, executable serialize/load/first-call.

Usage: python scripts/int8_aot_probe.py [--model faster_vit_1_224]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="faster_vit_1_224")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import fastervit_tpu as fvt
    from fastervit_tpu.ops.quant import quantize_variables, quantized_call
    from fastervit_tpu.utils.export import export_stablehlo, load_stablehlo

    out = {"model": args.model, "batch": args.batch, "dtype": "int8",
           "backend": jax.default_backend()}

    model = fvt.create_model(args.model, dtype=jnp.bfloat16, quantized=True)
    res = model.cfg.resolution[0]
    variables = jax.jit(model.module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)))
    qv = jax.jit(quantize_variables)(variables)
    x = jnp.asarray(np.random.RandomState(0).randn(
        args.batch, res, res, 3), jnp.bfloat16)

    def fwd(v, xx):
        return quantized_call(model.module.apply, v, xx)

    # 1. fresh jit compile (the cost being amortized)
    t0 = time.time()
    compiled = jax.jit(fwd).lower(qv, x).compile()
    out["fresh_compile_s"] = round(time.time() - t0, 1)
    y0 = np.asarray(compiled(qv, x))
    print(f"fresh compile: {out['fresh_compile_s']} s", flush=True)

    # 2. StableHLO artifact: export (trace-only), then load + first call
    t0 = time.time()
    blob, _ = export_stablehlo(model, qv, batch_size=args.batch,
                               dtype=jnp.bfloat16)
    out["stablehlo_export_s"] = round(time.time() - t0, 1)
    out["stablehlo_bytes"] = len(blob)
    t0 = time.time()
    call = load_stablehlo(blob)
    out["stablehlo_deserialize_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    y1 = np.asarray(jax.jit(call)(x))
    out["stablehlo_first_call_s"] = round(time.time() - t0, 1)
    out["stablehlo_parity_maxdiff"] = float(np.max(np.abs(
        y1.astype(np.float32) - y0.astype(np.float32))))
    print(f"stablehlo: export {out['stablehlo_export_s']} s, "
          f"load {out['stablehlo_deserialize_s']} s, first call "
          f"{out['stablehlo_first_call_s']} s", flush=True)

    # 3. serialized executable: the true skip-compile path (if supported)
    try:
        from jax.experimental import serialize_executable as se
        t0 = time.time()
        payload, in_tree, out_tree = se.serialize(compiled)
        out["exec_serialize_s"] = round(time.time() - t0, 1)
        out["exec_bytes"] = len(payload)
        t0 = time.time()
        loaded = se.deserialize_and_load(payload, in_tree, out_tree)
        out["exec_deserialize_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        y2 = np.asarray(loaded(qv, x))
        out["exec_first_call_s"] = round(time.time() - t0, 1)
        out["exec_parity_maxdiff"] = float(np.max(np.abs(
            y2.astype(np.float32) - y0.astype(np.float32))))
        print(f"executable: serialize {out['exec_serialize_s']} s, "
              f"load {out['exec_deserialize_s']} s, first call "
              f"{out['exec_first_call_s']} s", flush=True)
    except Exception as e:
        out["exec_error"] = f"{type(e).__name__}: {e}"[:300]
        print(f"executable serialization unsupported: {out['exec_error']}",
              flush=True)

    # verdict field: what a serving process actually saves
    fresh = out["fresh_compile_s"]
    sh = out.get("stablehlo_first_call_s")
    if sh is not None:
        out["stablehlo_amortizes_compile"] = bool(sh < 0.2 * fresh)
    ex = out.get("exec_first_call_s")
    if ex is not None:
        out["exec_amortizes_compile"] = bool(
            ex + out.get("exec_deserialize_s", 0.0) < 0.2 * fresh)

    path = os.path.join(REPO, "INT8_AOT_PROBE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
