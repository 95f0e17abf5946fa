import time
t0=time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
import arrow_tpu
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(name, body, shape=(8,128), dtype=jnp.int32):
    x = jnp.zeros(shape, dtype)
    def kern(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])
    try:
        pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        log(f"{name}: OK")
    except RecursionError:
        log(f"{name}: RECURSION")
    except Exception as e:
        log(f"{name}: {type(e).__name__} {str(e)[:100]}")

probe("jnp_roll_ax1", lambda v: jnp.roll(v, 3, axis=1))
probe("jnp_roll_ax0", lambda v: jnp.roll(v, 3, axis=0))
probe("pltpu_roll_ax0", lambda v: pltpu.roll(v, 3, axis=0))
probe("pltpu_roll_noax", lambda v: pltpu.roll(v, 3))
probe("concat_shift", lambda v: jnp.concatenate([v[:, 3:], v[:, :3]], axis=1))
