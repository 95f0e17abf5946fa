import time
t0=time.time()
def log(m): print(f"[{time.time()-t0:5.1f}s] {m}", flush=True)
import arrow_tpu
import jax, jax.numpy as jnp, jax.lax as lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

nb = 2
SUB, LANES = 8, 128
data = jax.ShapeDtypeStruct((nb * SUB, LANES), jnp.int32)
offs = jax.ShapeDtypeStruct((nb,), jnp.int32)

def probe(name, fn, *shapes):
    try:
        jax.jit(fn).lower(*shapes).compile()
        log(f"{name}: OK")
    except Exception as e:
        log(f"{name}: {type(e).__name__} {str(e)[:90]}")

# plain grid, no prefetch
def k0(d_ref, out_ref):
    out_ref[...] = d_ref[...] * 2
probe("g_plain_grid", lambda d: pl.pallas_call(
    k0, grid=(nb,),
    in_specs=[pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((nb * SUB, LANES), jnp.int32),
)(d), data)

# scalars via SMEM block (whole array, no blocking)
def k1(o_ref, d_ref, out_ref):
    out_ref[...] = d_ref[...] + o_ref[0]
probe("g_smem_scalar", lambda o, d: pl.pallas_call(
    k1, grid=(nb,),
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((nb * SUB, LANES), jnp.int32),
)(o, d), offs, data)

# ANY out + DMA, plain grid, scalar via SMEM
def k2(o_ref, d_ref, out_ref, scr, sem):
    i = pl.program_id(0)
    off = pl.multiple_of(lax.div(o_ref[i], jnp.int32(8)) * jnp.int32(8), 8)
    scr[...] = d_ref[...]
    cp = pltpu.make_async_copy(scr, out_ref.at[pl.ds(off, SUB), :], sem)
    cp.start(); cp.wait()
probe("g_any_dma_dynamic_smem", lambda o, d: pl.pallas_call(
    k2, grid=(nb,),
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    scratch_shapes=[pltpu.VMEM((SUB, LANES), jnp.int32), pltpu.SemaphoreType.DMA],
    out_shape=jax.ShapeDtypeStruct((nb * SUB + 8, LANES), jnp.int32),
    compiler_params=pltpu.CompilerParams(has_side_effects=True),
)(o, d), offs, data)
