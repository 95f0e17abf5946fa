import time, numpy as np
t0=time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
import arrow_tpu
import jax, jax.numpy as jnp, jax.lax as lax
x = jnp.asarray(np.arange(1<<20).astype(np.float32)); log("data")
@jax.jit
def f(y):
    def body(i, a):
        o = a[0] * 1.0001 + 1.5
        return lax.optimization_barrier((o,))
    return lax.fori_loop(0, 13, body, (y,))
r = f(x); _ = np.asarray(r[0][:1]); log("barrier fori ok")
from arrow_tpu.utils.timing import device_seconds_per_iter
t = device_seconds_per_iter(lambda y: y * 1.0001 + 1.5, x)
log(f"elementwise: {t*1e3:.4f}ms/iter ({(1<<20)*8/t/1e9:.0f} GB/s)")
t = device_seconds_per_iter(lambda y: y + (jnp.sum(y) * 0.001), x)
log(f"sum-chain: {t*1e3:.4f}ms/iter")
