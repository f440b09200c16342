import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time

def probe(name, fn, *args):
    t0 = time.time()
    out = np.asarray(fn(*args))
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)
    return out

from fastervit_tpu.ops.pallas_flash_attention import flash_window_mhsa
from fastervit_tpu.ops.pallas_attention import fused_window_mhsa
rng = np.random.RandomState(0)
# flash at 21k-384 stage2 shape
b, s, h, d = 2, 576, 16, 49
qkv = jnp.asarray(rng.randn(b, s, 3*h*d), jnp.bfloat16)
bias = jnp.asarray(rng.randn(h, s, s), jnp.float32)
probe("flash S=576 H=16", jax.jit(lambda q, b_: flash_window_mhsa(q, b_, h, d**-0.5)), qkv, bias)
# packed at 21k-384 stage3 shape
b2, s2, h2 = 2*4, 144, 32
qkv2 = jnp.asarray(rng.randn(b2, s2, 3*h2*d), jnp.bfloat16)
bias2 = jnp.asarray(rng.randn(h2, s2, s2), jnp.float32)
probe("packed S=144 H=32", jax.jit(lambda q, b_: fused_window_mhsa(q, b_, h2, d**-0.5)), qkv2, bias2)
# packed at fv0 shape for comparison
b3, s3, h3, d3 = 64, 53, 8, 32
qkv3 = jnp.asarray(rng.randn(b3, s3, 3*h3*d3), jnp.bfloat16)
bias3 = jnp.asarray(rng.randn(h3, s3, s3), jnp.float32)
probe("packed S=53 H=8", jax.jit(lambda q, b_: fused_window_mhsa(q, b_, h3, d3**-0.5)), qkv3, bias3)
