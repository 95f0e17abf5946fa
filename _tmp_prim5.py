import time, sys
import numpy as np
import jax, jax.numpy as jnp, jax.lax as lax

t00 = time.time()
def log(msg): print(f"[{time.time()-t00:7.2f}s] {msg}", flush=True)

n = 1 << 22
x = jnp.asarray(np.arange(n, dtype=np.int32))
log("x created")
_ = np.asarray(x[:1]); log("first tiny readback done")
_ = np.asarray(x[:1]); log("second tiny readback done")

@jax.jit
def loop8(y):
    return lax.fori_loop(0, 8, lambda i, a: a + 1, y)

log("compiling loop8 (lowered+compiled explicitly)")
c = loop8.lower(x).compile()
log("loop8 compiled")
y = c(x); log("loop8 dispatched")
_ = np.asarray(y[:1]); log("loop8 readback done")
t0 = time.perf_counter()
for _ in range(5):
    y = c(x)
    _ = np.asarray(y[:1])
log(f"5 loop8 runs w/ readback: {(time.perf_counter()-t0)/5*1e3:.1f}ms each")

@jax.jit
def loop64(y):
    return lax.fori_loop(0, 64, lambda i, a: a + 1, y)
c64 = loop64.lower(x).compile(); log("loop64 compiled")
y = c64(x); _ = np.asarray(y[:1]); log("loop64 warm")
t0 = time.perf_counter()
for _ in range(5):
    y = c64(x); _ = np.asarray(y[:1])
d64 = (time.perf_counter()-t0)/5
log(f"5 loop64 runs w/ readback: {d64*1e3:.1f}ms each")
