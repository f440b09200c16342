import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time
import fastervit_tpu as fvt
from fastervit_tpu.ops import attention as att

name = 'faster_vit_4_21k_384'
m = fvt.create_model(name, resolution=384, dtype=jnp.bfloat16)
v = m.init(jax.random.PRNGKey(0))
x = jnp.asarray(np.random.RandomState(0).randn(2, 384, 384, 3), jnp.float32)

fwd = jax.jit(lambda v, x: m.apply(v, x))
t0=time.time(); y = fwd(v, x); yv = np.asarray(y); print('pallas/flash compile+run %.1fs' % (time.time()-t0), yv.shape, float(yv[0,:3].sum()))

att.set_default_impl('jnp')
fwd2 = jax.jit(lambda v, x: m.apply(v, x))
t0=time.time(); y2 = np.asarray(fwd2(v, x)); print('jnp compile+run %.1fs' % (time.time()-t0))
print('max |delta| =', float(np.abs(yv.astype(np.float32)-y2.astype(np.float32)).max()))
print('logits[0,:5] pallas', yv[0,:5].astype(np.float32))
print('logits[0,:5] jnp   ', y2[0,:5].astype(np.float32))
