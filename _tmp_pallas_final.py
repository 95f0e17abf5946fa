import time
t0=time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
import numpy as np
import arrow_tpu
import jax, jax.numpy as jnp
from arrow_tpu.utils import bits as B
from arrow_tpu.compute.kernels.compaction import compact_pallas
from arrow_tpu.utils.timing import device_seconds_per_iter

n = 1 << 24  # 16M
key = jax.random.key(0)
data = jax.jit(lambda k: jax.random.randint(k, (n,), 0, 1 << 30, dtype=jnp.uint32))(key).astype(jnp.int32)
words = jax.jit(lambda k: B.pack_bits(jax.random.bernoulli(k, 0.5, (n,))))(jax.random.key(1))
log("data gen dispatched")

out, count = compact_pallas(data, words)
k = int(count); log(f"compact_pallas ran; count={k}")
got = np.asarray(out[:8192])
dnp = np.asarray(data); mnp = B.unpack_bits_np(np.asarray(words), n)
exp = dnp[mnp][:8192]
print("exact match head:", bool((got == exp).all()), flush=True)
tail_got = np.asarray(out[k-4096:k])
tail_exp = dnp[mnp][k-4096:k]
print("exact match tail:", bool((tail_got == tail_exp).all()), flush=True)

def step(y, w):
    o, c = compact_pallas(y, w)
    return o[:n], w
t = device_seconds_per_iter(step, (data, words))
log(f"compact_pallas 16M: {t*1e3:.3f}ms/iter = {n/t/1e9:.2f} Grows/s ({n*9/t/1e9:.0f} GB/s algorithmic)")
log("ALL DONE")
