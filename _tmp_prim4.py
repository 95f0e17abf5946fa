import numpy as np
import jax.numpy as jnp, jax.lax as lax
from arrow_tpu.utils.timing import device_seconds_per_iter

n = 1 << 22
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
mask = jnp.asarray(rng.random(n) < 0.5)
idx = jnp.asarray(rng.integers(0, n, n).astype(np.int32))

def rep(name, fn, args, bytes_per_iter):
    s = device_seconds_per_iter(fn, args)
    print(f"{name}: {s*1e3:.3f}ms  {n/s/1e9:.2f} Grows/s  {bytes_per_iter/s/1e9:.0f} GB/s", flush=True)

rep("add1", lambda y: y + 1, x, n*8)
rep("gather", lambda y: y[idx], x, n*12)
rep("scatter", lambda y: jnp.zeros((n,), jnp.int32).at[idx].set(y, mode="drop"), x, n*12)
rep("sort_by_mask", lambda y: lax.sort([(~mask).astype(jnp.int32), y], num_keys=1, is_stable=True)[1], x, n*8)
rep("cumsum", lambda y: jnp.cumsum(y), x, n*8)
def filter_scatter(y):
    b = mask
    pos = jnp.cumsum(b.astype(jnp.int32)) - 1
    tgt = jnp.where(b, pos, n)
    return jnp.zeros((n,), jnp.int32).at[tgt].set(y, mode="drop")
rep("filter_scatter", filter_scatter, x, n*9)
def filter_ss(y):
    cs = jnp.cumsum(mask.astype(jnp.int32))
    j = lax.broadcasted_iota(jnp.int32, (n,), 0)
    pos = jnp.searchsorted(cs, j + 1, side="left")
    return y[jnp.clip(pos, 0, n - 1)]
rep("filter_searchsorted", filter_ss, x, n*9)
