import time
t0=time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
import arrow_tpu
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(name, in_dtype, body):
    x = jnp.zeros((8, 128), in_dtype)
    def kern(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])
    try:
        pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        log(f"{name}: OK")
    except RecursionError:
        log(f"{name}: RECURSION")
    except Exception as e:
        log(f"{name}: {type(e).__name__} {str(e)[:80]}")

probe("i8_to_i32", jnp.int8, lambda v: v.astype(jnp.int32))
probe("i8_cmp_to_i32", jnp.int8, lambda v: (v != 0).astype(jnp.int32))
probe("i32_id", jnp.int32, lambda v: v)
probe("bool_where", jnp.int32, lambda v: jnp.where(v != 0, v, 0))
probe("roll", jnp.int32, lambda v: pltpu.roll(v, 3, axis=1))
