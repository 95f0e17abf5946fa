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

# 1: scalar prefetch + blocked VMEM out
def k1(o_ref, d_ref, out_ref):
    out_ref[...] = d_ref[...] + o_ref[pl.program_id(0)]
probe("p1_prefetch_vmem_out", lambda o, d: pl.pallas_call(
    k1,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((nb * SUB, LANES), jnp.int32),
)(o, d), offs, data)

# 2: ANY out + DMA from VMEM scratch at static offset
def k2(o_ref, d_ref, out_ref, scr, sem):
    scr[...] = d_ref[...]
    cp = pltpu.make_async_copy(scr, out_ref.at[pl.ds(0, SUB), :], sem)
    cp.start(); cp.wait()
probe("p2_any_dma_static", lambda o, d: pl.pallas_call(
    k2,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((SUB, LANES), jnp.int32), pltpu.SemaphoreType.DMA],
    ),
    out_shape=jax.ShapeDtypeStruct((nb * SUB, LANES), jnp.int32),
    compiler_params=pltpu.CompilerParams(has_side_effects=True),
)(o, d), offs, data)

# 3: same but dynamic multiple_of offset
def k3(o_ref, d_ref, out_ref, scr, sem):
    i = pl.program_id(0)
    off = pl.multiple_of(lax.div(o_ref[i], jnp.int32(8)) * jnp.int32(8), 8)
    scr[...] = d_ref[...]
    cp = pltpu.make_async_copy(scr, out_ref.at[pl.ds(off, SUB), :], sem)
    cp.start(); cp.wait()
probe("p3_any_dma_dynamic", lambda o, d: pl.pallas_call(
    k3,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((SUB, LANES), jnp.int32), pltpu.SemaphoreType.DMA],
    ),
    out_shape=jax.ShapeDtypeStruct((nb * SUB + 8, LANES), jnp.int32),
    compiler_params=pltpu.CompilerParams(has_side_effects=True),
)(o, d), offs, data)
