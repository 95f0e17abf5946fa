import time
import numpy as np
import jax, jax.numpy as jnp, jax.lax as lax

n = 1 << 22
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
mask = jnp.asarray(rng.random(n) < 0.5)
idx = jnp.asarray(rng.integers(0, n, n).astype(np.int32))

def timeit_chain(name, fn, x, iters=10):
    f = jax.jit(fn)
    y = f(x); _ = np.asarray(y[:1])  # warm
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = f(y)
    _ = np.asarray(y[:1])  # force completion via readback
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.3f}ms  ({n/dt/1e9:.2f} Grows/s)", flush=True)

# pure readback latency
t0=time.perf_counter()
for _ in range(5): _ = np.asarray(x0[:1])
print(f"readback latency: {(time.perf_counter()-t0)/5*1e3:.2f}ms", flush=True)

timeit_chain("gather_chain", lambda y: y[idx], x0)
timeit_chain("scatter_chain", lambda y: jnp.zeros((n,), jnp.int32).at[idx].set(y, mode="drop"), x0)
timeit_chain("sort_chain", lambda y: lax.sort([(~mask).astype(jnp.int32), y], num_keys=1, is_stable=True)[1], x0)
timeit_chain("add_chain", lambda y: y + 1, x0)
def ss_compact(y):
    cs = jnp.cumsum(mask.astype(jnp.int32))
    j = lax.broadcasted_iota(jnp.int32, (n,), 0)
    pos = jnp.searchsorted(cs, j + 1, side="left")
    return y[jnp.clip(pos, 0, n - 1)]
timeit_chain("searchsorted_compact", ss_compact, x0)
