import time, sys
t0=time.time()
def log(m): print(f"[{time.time()-t0:5.1f}s] {m}", flush=True)
import arrow_tpu
import jax, jax.numpy as jnp
from arrow_tpu.compute.kernels.compaction import compact_pallas
import numpy as np
n = 1 << 14
data = jax.ShapeDtypeStruct((n,), jnp.int32)
words = jax.ShapeDtypeStruct((n // 32,), jnp.uint32)
try:
    jax.jit(compact_pallas).lower(data, words)
    log("lower OK")
except RecursionError as e:
    log("RECURSION")
except Exception as e:
    log(f"{type(e).__name__}: {str(e)[:150]}")
