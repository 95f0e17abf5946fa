import time
import numpy as np
import jax.numpy as jnp
t0=time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
import arrow_tpu
from arrow_tpu.utils import bits as B
from arrow_tpu.compute.kernels.reduction import sum_pallas
from arrow_tpu.compute.kernels.elementwise import binary_op_pallas
from arrow_tpu.compute.kernels.compaction import compact_pallas

n = 1 << 20
x = jnp.asarray(np.arange(n) % 97).astype(jnp.float32)
log("data ready")
s = float(sum_pallas(x)); log(f"sum_pallas compiled+ran: {s} vs {float((np.arange(n)%97).sum())}")
a = x; b = x
out, v = binary_op_pallas(a, b, None, None, fn=lambda p, q: p + q)
log(f"binary_op_pallas ok: {float(out[5])} vs {float(2*x[5])}")
rng = np.random.default_rng(0)
mask = rng.random(n) < 0.3
w = jnp.asarray(B.pack_bits_np(mask))
data = jnp.asarray((rng.integers(0, 1<<30, n)).astype(np.int32))
o, c = compact_pallas(data, w)
k = int(c); log(f"compact_pallas count={k} expected={int(mask.sum())}")
got = np.asarray(o)[:k]
exp = np.asarray(data)[mask]
print("compact exact match:", bool((got == exp).all()), flush=True)
# timing
from arrow_tpu.utils.timing import device_seconds_per_iter
tt = device_seconds_per_iter(lambda y: compact_pallas(y, w)[0][:n], data)
log(f"compact_pallas: {tt*1e3:.3f}ms/iter = {n/tt/1e9:.2f} Grows/s")
