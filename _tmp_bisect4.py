import time
t0=time.time()
def log(m): print(f"[{time.time()-t0:5.1f}s] {m}", flush=True)
import arrow_tpu
import jax, jax.numpy as jnp, jax.lax as lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANES = 8, 128
nb = 4
data = jax.ShapeDtypeStruct((nb * SUB, LANES), jnp.int32)
offs = jax.ShapeDtypeStruct((nb,), jnp.int32)

def probe(name, kern, extra_scratch=()):
    def f(o, d):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((SUB, LANES), jnp.int32), pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA, *extra_scratch],
            out_shape=jax.ShapeDtypeStruct((nb * SUB + SUB, LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(o, d)
    try:
        jax.jit(f).lower(offs, data).compile()
        log(f"{name}: OK")
    except Exception as e:
        log(f"{name}: {type(e).__name__} {str(e)[:100]}")

# a: single unrolled DMA round-trip, no loop
def ka(o_ref, d_hbm, out_ref, buf, s1, s2):
    rd = pltpu.make_async_copy(d_hbm.at[pl.ds(0, SUB), :], buf, s1)
    rd.start(); rd.wait()
    wr = pltpu.make_async_copy(buf, out_ref.at[pl.ds(0, SUB), :], s2)
    wr.start(); wr.wait()
probe("a_noloop_dma", ka)

# b: fori loop with DMA round-trips
def kb(o_ref, d_hbm, out_ref, buf, s1, s2):
    def body(i, c):
        row0 = pl.multiple_of(i * jnp.int32(SUB), SUB)
        rd = pltpu.make_async_copy(d_hbm.at[pl.ds(row0, SUB), :], buf, s1)
        rd.start(); rd.wait()
        wr = pltpu.make_async_copy(buf, out_ref.at[pl.ds(row0, SUB), :], s2)
        wr.start(); wr.wait()
        return c
    lax.fori_loop(jnp.int32(0), jnp.int32(nb), body, jnp.int32(0))
probe("b_fori_dma", kb)

# c: fori loop with compute between
def kc(o_ref, d_hbm, out_ref, buf, s1, s2):
    def body(i, c):
        row0 = pl.multiple_of(i * jnp.int32(SUB), SUB)
        rd = pltpu.make_async_copy(d_hbm.at[pl.ds(row0, SUB), :], buf, s1)
        rd.start(); rd.wait()
        buf[...] = buf[...] * 2 + o_ref[i]
        wr = pltpu.make_async_copy(buf, out_ref.at[pl.ds(row0, SUB), :], s2)
        wr.start(); wr.wait()
        return c
    lax.fori_loop(jnp.int32(0), jnp.int32(nb), body, jnp.int32(0))
probe("c_fori_compute", kc)
