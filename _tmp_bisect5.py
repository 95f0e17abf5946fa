import time
t0=time.time()
def log(m): print(f"[{time.time()-t0:5.1f}s] {m}", flush=True)
import arrow_tpu
import jax, jax.numpy as jnp, jax.lax as lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from arrow_tpu.compute.kernels import compaction as CK

SUB, LANES = 8, 128
nb = 4
data = jax.ShapeDtypeStruct((nb * SUB, LANES), jnp.int32)
offs = jax.ShapeDtypeStruct((nb,), jnp.int32)

def probe(name, kern, scratch):
    def f(o, d):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=list(scratch),
            out_shape=jax.ShapeDtypeStruct((nb * SUB + SUB, LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(o, d)
    try:
        jax.jit(f).lower(offs, data).compile()
        log(f"{name}: OK")
    except Exception as e:
        log(f"{name}: {type(e).__name__} {str(e)[:100]}")

# d: out as DMA source
def kd(o_ref, d_hbm, out_ref, buf, s1, s2):
    def body(i, c):
        row0 = pl.multiple_of(i * jnp.int32(SUB), SUB)
        rd = pltpu.make_async_copy(out_ref.at[pl.ds(row0, SUB), :], buf, s1)
        rd.start(); rd.wait()
        wr = pltpu.make_async_copy(buf, out_ref.at[pl.ds(row0, SUB), :], s2)
        wr.start(); wr.wait()
        return c
    lax.fori_loop(jnp.int32(0), jnp.int32(nb), body, jnp.int32(0))
probe("d_out_as_src", kd, (pltpu.VMEM((SUB, LANES), jnp.int32), pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA))

# e: conditional roll network in loop
def ke(o_ref, d_hbm, out_ref, buf, s1, s2):
    def body(i, c):
        row0 = pl.multiple_of(i * jnp.int32(SUB), SUB)
        rd = pltpu.make_async_copy(d_hbm.at[pl.ds(row0, SUB), :], buf, s1)
        rd.start(); rd.wait()
        shift = o_ref[i]
        w = buf[...]
        for s in range(7):
            bit = 1 << s
            rolled = CK._flat_roll_right(w, bit)
            w = jnp.where(((shift >> s) & 1) == 1, rolled, w)
        buf[...] = w
        wr = pltpu.make_async_copy(buf, out_ref.at[pl.ds(row0, SUB), :], s2)
        wr.start(); wr.wait()
        return c
    lax.fori_loop(jnp.int32(0), jnp.int32(nb), body, jnp.int32(0))
probe("e_cond_roll_loop", ke, (pltpu.VMEM((SUB, LANES), jnp.int32), pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA))

# f: concatenate in loop
def kf(o_ref, d_hbm, out_ref, buf, win, s1, s2):
    def body(i, c):
        row0 = pl.multiple_of(i * jnp.int32(SUB), SUB)
        rd = pltpu.make_async_copy(d_hbm.at[pl.ds(row0, SUB), :], buf, s1)
        rd.start(); rd.wait()
        w = jnp.concatenate([buf[...], jnp.zeros((8, LANES), jnp.int32)], axis=0)
        win[...] = w
        wr = pltpu.make_async_copy(win, out_ref.at[pl.ds(0, 16) if False else pl.ds(row0, 16), :], s2)
        wr.start(); wr.wait()
        return c
    lax.fori_loop(jnp.int32(0), jnp.int32(2), body, jnp.int32(0))
probe("f_concat_loop", kf, (pltpu.VMEM((SUB, LANES), jnp.int32), pltpu.VMEM((16, LANES), jnp.int32), pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA))
