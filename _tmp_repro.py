import time
import numpy as np
t0=time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
import arrow_tpu
import jax, jax.numpy as jnp, jax.lax as lax
n = 1 << 24
k = jnp.zeros(n, jnp.uint32); log("data")

def try_compile(name, fn):
    try:
        jax.jit(fn).lower(k).compile()
        log(f"{name}: compile OK")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")

try_compile("sort2_u32", lambda x: lax.sort([x, x], num_keys=1, is_stable=True)[0])
try_compile("sort4_i64", lambda x: lax.sort([jnp.where(x>0,0,1).astype(jnp.int32), x, x.astype(jnp.int64), x.astype(jnp.int64)], num_keys=1, is_stable=True)[1])
try_compile("sort4_i32", lambda x: lax.sort([jnp.where(x>0,0,1).astype(jnp.int32), x, x.astype(jnp.int32), x.astype(jnp.int32)], num_keys=1, is_stable=True)[1])
def segscan32(x):
    from arrow_tpu.utils.scans import segmented_scan
    starts = (x & 1) == 0
    return segmented_scan(x.astype(jnp.int32), starts, lambda a,b: a+b)
try_compile("segscan_i32", segscan32)
def segscan64(x):
    from arrow_tpu.utils.scans import segmented_scan
    starts = (x & 1) == 0
    return segmented_scan(x.astype(jnp.int64), starts, lambda a,b: a+b)
try_compile("segscan_i64", segscan64)
