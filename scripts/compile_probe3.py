import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time
from fastervit_tpu.ops import pallas_flash_attention as pfa

def probe(name, fn, *args):
    t0 = time.time()
    np.asarray(fn(*args))
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)

rng = np.random.RandomState(0)
b, s, h, d = 2, 576, 16, 49
q = jnp.asarray(rng.randn(b, h, s, d), jnp.bfloat16)
k = jnp.asarray(rng.randn(b, h, s, d), jnp.bfloat16)
v = jnp.asarray(rng.randn(b, h, s, d), jnp.bfloat16)
bias = jnp.asarray(rng.randn(h, s, s), jnp.float32)
probe("kernel-only H=16 hd=49", jax.jit(lambda q,k,v,b_: pfa._flash_forward(q,k,v,b_, d**-0.5, False)), q, k, v, bias)
qkv = jnp.asarray(rng.randn(b, s, 3*h*d), jnp.bfloat16)
probe("split-heads-only", jax.jit(lambda x: [a+1.0 for a in pfa._split_heads(x, h)]), qkv)
probe("merge-only", jax.jit(lambda x: pfa._merge_heads(x)), q)
