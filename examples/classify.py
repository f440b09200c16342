"""Classification: load converted weights, validate, export (quick tour)."""
import jax
import jax.numpy as jnp

import fastervit_tpu as fvt

model = fvt.create_model("faster_vit_0_224", dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0))
# With a reference checkpoint available:
#   variables = model.load_pytorch("fastervit_0_224_1k.pth.tar")

# jitted inference
logits = jax.jit(model.module.apply)(variables, jnp.zeros((8, 224, 224, 3),
                                                          jnp.bfloat16))
print("logits:", logits.shape)

# deploy: AOT-compiled executable with biases constant-folded
compiled = model.aot_compile(variables, batch_size=8, dtype=jnp.bfloat16)
print("aot:", compiled(jnp.zeros((8, 224, 224, 3), jnp.bfloat16)).shape)

# serving across processes: serialize the COMPILED executable — loads in
# ~1 s and skips XLA compilation entirely (INT8_AOT_PROBE.json: 11x faster
# serving startup than re-compiling from StableHLO; topology-bound)
from fastervit_tpu.utils.export import export_executable, load_executable
blob = export_executable(model, variables, batch_size=8, dtype=jnp.bfloat16)
serve = load_executable(blob)          # in the serving process
print("served:", serve(variables, jnp.zeros((8, 224, 224, 3),
                                            jnp.bfloat16)).shape)
