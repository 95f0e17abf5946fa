import time, sys
import numpy as np
t00 = time.time()
def log(msg): print(f"[{time.time()-t00:7.2f}s] {msg}", flush=True)

import arrow_tpu  # x64 on, like the real bench
import jax, jax.numpy as jnp, jax.lax as lax
from arrow_tpu.utils.timing import device_seconds_per_iter
log("imports done")

n = 1 << 22
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
mask = jnp.asarray(rng.random(n) < 0.5)
idx = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
_ = np.asarray(x[:1]); _ = np.asarray(mask[:1]); _ = np.asarray(idx[:1])
log("uploads done")

def rep(name, fn, args):
    t0 = time.time()
    s = device_seconds_per_iter(fn, args)
    log(f"{name}: {s*1e3:.3f}ms/iter  ({n/s/1e9:.2f} Grows/s)  [measured in {time.time()-t0:.1f}s]")

rep("xor_mix", lambda y: (y ^ 123) + (y >> 7), x)
rep("gather", lambda y: y[idx], x)
rep("sort_by_mask", lambda y: lax.sort([(~mask).astype(jnp.int32), y], num_keys=1, is_stable=True)[1], x)
def filter_scatter(y):
    b = mask
    pos = jnp.cumsum(b.astype(jnp.int32)) - 1
    tgt = jnp.where(b, pos, n)
    return jnp.zeros((n,), jnp.int32).at[tgt].set(y, mode="drop")
rep("filter_scatter", filter_scatter, x)
def filter_ss(y):
    cs = jnp.cumsum(mask.astype(jnp.int32))
    j = lax.broadcasted_iota(jnp.int32, (n,), 0)
    pos = jnp.searchsorted(cs, j + 1, side="left")
    return y[jnp.clip(pos, 0, n - 1)]
rep("filter_searchsorted", filter_ss, x)
log("ALL DONE")
