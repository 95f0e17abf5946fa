import time
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

def loop(a):
    def body(i, ab):
        return lax.optimization_barrier(agg_step(*ab))
    return lax.fori_loop(0, 13, body, a)

try:
    jax.jit(loop).lower((gk, gv)).compile()
    log("fori agg: compile OK")
except Exception as e:
    log(f"fori agg: FAILED {str(e)[:120]}")
try:
    jax.jit(loop).lower((gk, gv)).compile(
        {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    )
    log("fori agg + vmem flag: compile OK")
except Exception as e:
    log(f"fori agg + vmem flag: FAILED {str(e)[:160]}")
