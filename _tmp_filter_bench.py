import time
import numpy as np
import jax
import arrow_tpu as at
from arrow_tpu import compute as C

n = 1 << 22
rng = np.random.default_rng(0)
x = at.Int32Array.from_slice(rng.integers(0, 1 << 30, n).astype(np.int32))
m = at.BooleanArray.from_slice(rng.random(n) < 0.5)
print("setup done", flush=True)
t0 = time.perf_counter()
r = C.filter(x, m)
jax.block_until_ready(r.data)
print(f"filter compile+run1: {time.perf_counter()-t0:.2f}s len={len(r)}", flush=True)
t0 = time.perf_counter()
r = C.filter(x, m)
jax.block_until_ready(r.data)
print(f"filter run2: {(time.perf_counter()-t0)*1e3:.2f}ms", flush=True)
