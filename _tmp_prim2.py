import time
import numpy as np
import jax, jax.numpy as jnp, jax.lax as lax

n = 1 << 22
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
mask = jnp.asarray(rng.random(n) < 0.5)
idx = jnp.asarray(rng.integers(0, n, n).astype(np.int32))

def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f}ms  ({n/dt/1e9:.2f} Grows/s)", flush=True)

timeit("gather", lambda x, i: x[i], x, idx)
timeit("scatter_set", lambda x, i: jnp.zeros((n,), jnp.int32).at[i].set(x, mode="drop"), x, idx)
timeit("sort_compact", lambda x, m: lax.sort([(~m).astype(jnp.int32), x], num_keys=1, is_stable=True)[1], x, mask)
def ss_compact(x, m):
    cs = jnp.cumsum(m.astype(jnp.int32))
    j = lax.broadcasted_iota(jnp.int32, (n,), 0)
    pos = jnp.searchsorted(cs, j + 1, side="left")
    return x[jnp.clip(pos, 0, n - 1)]
timeit("searchsorted_compact", ss_compact, x, mask)
timeit("cumsum", lambda m: jnp.cumsum(m.astype(jnp.int32)), mask)
