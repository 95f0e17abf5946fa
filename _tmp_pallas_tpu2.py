import time
t0=time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
import numpy as np
import arrow_tpu
import jax, jax.numpy as jnp
from arrow_tpu.utils import bits as B
from arrow_tpu.compute.kernels.compaction import compact_pallas
from arrow_tpu.compute.kernels.reduction import sum_pallas
from arrow_tpu.compute.kernels.elementwise import binary_op_pallas
from arrow_tpu.utils.timing import device_seconds_per_iter

n = 1 << 24  # 16M

# on-device data gen
key = jax.random.key(0)
data = jax.jit(lambda k: jax.random.randint(k, (n,), 0, 1 << 30, dtype=jnp.uint32))(key).astype(jnp.int32)
words = jax.jit(lambda k: B.pack_bits(jax.random.bernoulli(k, 0.5, (n,))))(jax.random.key(1))
log("data gen dispatched")

# correctness (small slice readback)
out, count = compact_pallas(data, words)
k = int(count); log(f"compact_pallas compiled; count={k}")
got = np.asarray(out[:4096])
dnp = np.asarray(data); mnp = B.unpack_bits_np(np.asarray(words), n)
exp = dnp[mnp][:4096]
print("exact match head:", bool((got == exp).all()), flush=True)

# perf: chain data through the kernel
def step(y, w):
    o, c = compact_pallas(y, w)
    return o[:n], w
t = device_seconds_per_iter(step, (data, words))
log(f"compact_pallas 16M: {t*1e3:.3f}ms/iter = {n/t/1e9:.2f} Grows/s ({n*6.125/t/1e9:.0f} GB/s)")

# pallas sum
s = sum_pallas(data.astype(jnp.float32) * 0 + 1)
log(f"sum_pallas = {float(s)} (expect {n})")
t = device_seconds_per_iter(lambda y: (sum_pallas(y) + y).astype(y.dtype), data.astype(jnp.float32))
log(f"sum_pallas-chain 16M: {t*1e3:.3f}ms/iter")

# pallas elementwise
t = device_seconds_per_iter(lambda y: binary_op_pallas(y, y, None, None, fn=lambda a, b: a + b)[0], data)
log(f"binary_op_pallas 16M: {t*1e3:.3f}ms/iter ({n*12/t/1e9:.0f} GB/s)")
log("ALL DONE")
