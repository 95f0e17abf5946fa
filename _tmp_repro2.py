import time
import numpy as np
t0=time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
import arrow_tpu
import jax, jax.numpy as jnp, jax.lax as lax
from arrow_tpu.utils.scans import segmented_scan, segment_ends, stable_partition
n = 1 << 24
gk = jnp.zeros(n, jnp.uint32); gv = jnp.zeros(n, jnp.int32); log("data")

def agg_step(k, v):
    sk, sv = lax.sort([k, v], num_keys=1, is_stable=True)
    idx = lax.broadcasted_iota(jnp.int32, (n,), 0)
    starts = (idx == 0) | (sk != jnp.roll(sk, 1))
    g = jnp.sum(starts, dtype=jnp.uint32)
    ssum = segmented_scan(sv.astype(jnp.int64), starts, lambda a, b: a + b)
    scnt = segmented_scan(jnp.ones_like(sv, jnp.int64), starts, lambda a, b: a + b)
    ends = segment_ends(starts, n)
    parts = stable_partition(ends, [sk, ssum, scnt])
    live = lax.broadcasted_iota(jnp.uint32, (n,), 0) < g
    return jnp.where(live, parts[0], jnp.zeros_like(parts[0])), v

def agg_step32(k, v):
    sk, sv = lax.sort([k, v], num_keys=1, is_stable=True)
    idx = lax.broadcasted_iota(jnp.int32, (n,), 0)
    starts = (idx == 0) | (sk != jnp.roll(sk, 1))
    g = jnp.sum(starts, dtype=jnp.uint32)
    ssum = segmented_scan(sv, starts, lambda a, b: a + b)
    scnt = segmented_scan(jnp.ones_like(sv), starts, lambda a, b: a + b)
    ends = segment_ends(starts, n)
    parts = stable_partition(ends, [sk, ssum, scnt])
    live = lax.broadcasted_iota(jnp.uint32, (n,), 0) < g
    return jnp.where(live, parts[0], jnp.zeros_like(parts[0])), v

def try_compile(name, fn):
    try:
        jax.jit(fn).lower(gk, gv).compile()
        log(f"{name}: compile OK")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")

try_compile("agg_i64", agg_step)
try_compile("agg_i32", agg_step32)

def join_step(p, b):
    sb = lax.sort([b], num_keys=1)[0]
    lo = jnp.searchsorted(sb, p, side="left", method="sort")
    hi = jnp.searchsorted(sb, p, side="right", method="sort")
    cnt = (hi - lo).astype(jnp.int64)
    return p ^ (jnp.cumsum(cnt).astype(jnp.uint64) & jnp.uint64(1)), b
pk = jnp.zeros(n >> 1, jnp.uint64)
def try2(name, fn):
    try:
        jax.jit(fn).lower(pk, pk).compile()
        log(f"{name}: compile OK")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
try2("join_u64", join_step)
