import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time
from fastervit_tpu.ops.pallas_flash_attention import flash_window_mhsa

def probe(name, fn, *args):
    t0 = time.time()
    np.asarray(fn(*args))
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)

rng = np.random.RandomState(0)
for (b, s, h, d) in [(2, 576, 16, 64), (2, 576, 16, 128), (2, 576, 4, 49)]:
    qkv = jnp.asarray(rng.randn(b, s, 3*h*d), jnp.bfloat16)
    bias = jnp.asarray(rng.randn(h, s, s), jnp.float32)
    probe(f"flash S={s} H={h} hd={d}", jax.jit(lambda q, b_, h=h, d=d: flash_window_mhsa(q, b_, h, d**-0.5)), qkv, bias)
