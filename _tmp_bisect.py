import time
t0=time.time()
def log(m): print(f"[{time.time()-t0:5.1f}s] {m}", flush=True)
import arrow_tpu
import jax, jax.numpy as jnp, jax.lax as lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from arrow_tpu.compute.kernels import compaction as CK

n = 1 << 14
nb = n // CK.BLOCK
data = jax.ShapeDtypeStruct((nb * CK.SUBL, CK.LANES), jnp.int32)
mask = jax.ShapeDtypeStruct((nb * CK.SUBL, CK.LANES), jnp.int32)
offs = jax.ShapeDtypeStruct((nb,), jnp.int32)

def build(kern, out_rows):
    def f(o, d, m):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nb,),
                in_specs=[
                    pl.BlockSpec((CK.SUBL, CK.LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((CK.SUBL, CK.LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((CK.SUBW, CK.LANES), jnp.int32),
                    pltpu.VMEM((CK.TILE // CK.LANES, CK.LANES), jnp.int32),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((out_rows, CK.LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(o, d, m)
    return f

out_rows = (n + CK.WIN) // CK.LANES

def probe(name, kern):
    try:
        jax.jit(build(kern, out_rows)).lower(offs, data, mask).compile()
        log(f"{name}: COMPILE OK")
    except Exception as e:
        log(f"{name}: {type(e).__name__} {str(e)[:110]}")

# A: compaction only, static write via DMA at fixed offset 0
def kA(offsets_ref, d_ref, m_ref, out_ref, win, prev, sem, sem2):
    sel = m_ref[...]
    rows_i = lax.broadcasted_iota(jnp.int32, (CK.SUBL, CK.LANES), 0)
    cols_i = lax.broadcasted_iota(jnp.int32, (CK.SUBL, CK.LANES), 1)
    idx = rows_i * CK.LANES + cols_i
    ps = sel
    for s in range(CK.LOGB):
        bit = 1 << s
        ps = ps + jnp.where(idx >= bit, CK._flat_roll_right(ps, bit), jnp.zeros_like(ps))
    rank = ps - sel
    cur = d_ref[...]
    occ = sel
    rem = jnp.where(sel == 1, idx - rank, jnp.zeros_like(idx))
    one = jnp.ones_like(occ); zero = jnp.zeros_like(occ)
    for s in range(CK.LOGB):
        bit = 1 << s
        nxt_cur = CK._flat_roll_left(cur, bit)
        nxt_occ = CK._flat_roll_left(occ, bit)
        nxt_rem = CK._flat_roll_left(rem, bit)
        moved_in = (nxt_occ == 1) & (((nxt_rem >> s) & 1) == 1) & (idx < (CK.BLOCK - bit))
        my_move = (occ == 1) & (((rem >> s) & 1) == 1)
        cur = jnp.where(moved_in, nxt_cur, cur)
        occ = jnp.where(moved_in, one, jnp.where(my_move, zero, occ))
        rem = jnp.where(moved_in, nxt_rem - bit, rem)
    win[0:CK.SUBL, :] = cur
    wr = pltpu.make_async_copy(win, out_ref.at[pl.ds(0, CK.SUBW), :], sem)
    wr.start(); wr.wait()
probe("A_compact_static_dma", kA)

# B: dynamic aligned write, no rotate/readback
def kB(offsets_ref, d_ref, m_ref, out_ref, win, prev, sem, sem2):
    i = pl.program_id(0)
    off = offsets_ref[i]
    aligned_row = pl.multiple_of(lax.div(off, jnp.int32(CK.TILE)) * jnp.int32(CK.TILE // CK.LANES), CK.TILE // CK.LANES)
    win[0:CK.SUBL, :] = d_ref[...]
    wr = pltpu.make_async_copy(win, out_ref.at[pl.ds(aligned_row, CK.SUBW), :], sem)
    wr.start(); wr.wait()
probe("B_dyn_aligned_write", kB)

# C: + scalar-conditional rotate
def kC(offsets_ref, d_ref, m_ref, out_ref, win, prev, sem, sem2):
    i = pl.program_id(0)
    off = offsets_ref[i]
    aligned_row = pl.multiple_of(lax.div(off, jnp.int32(CK.TILE)) * jnp.int32(CK.TILE // CK.LANES), CK.TILE // CK.LANES)
    shift = off - aligned_row * jnp.int32(CK.LANES)
    window = jnp.concatenate([d_ref[...], jnp.zeros((CK.SUBW - CK.SUBL, CK.LANES), jnp.int32)], axis=0)
    for s in range(CK.TILE.bit_length() - 1):
        bit = 1 << s
        rolled = CK._flat_roll_right(window, bit)
        window = jnp.where(((shift >> s) & 1) == 1, rolled, window)
    win[...] = window
    wr = pltpu.make_async_copy(win, out_ref.at[pl.ds(aligned_row, CK.SUBW), :], sem)
    wr.start(); wr.wait()
probe("C_rotate", kC)

# D: + readback merge
def kD(offsets_ref, d_ref, m_ref, out_ref, win, prev, sem, sem2):
    i = pl.program_id(0)
    off = offsets_ref[i]
    aligned_row = pl.multiple_of(lax.div(off, jnp.int32(CK.TILE)) * jnp.int32(CK.TILE // CK.LANES), CK.TILE // CK.LANES)
    shift = off - aligned_row * jnp.int32(CK.LANES)
    rd = pltpu.make_async_copy(out_ref.at[pl.ds(aligned_row, CK.TILE // CK.LANES), :], prev, sem2)
    rd.start()
    widx = lax.broadcasted_iota(jnp.int32, (CK.SUBW, CK.LANES), 0) * CK.LANES + lax.broadcasted_iota(jnp.int32, (CK.SUBW, CK.LANES), 1)
    window = jnp.concatenate([d_ref[...], jnp.zeros((CK.SUBW - CK.SUBL, CK.LANES), jnp.int32)], axis=0)
    rd.wait()
    head = jnp.concatenate([prev[...], jnp.zeros((CK.SUBW - CK.TILE // CK.LANES, CK.LANES), jnp.int32)], axis=0)
    win[...] = jnp.where(widx < shift, head, window)
    wr = pltpu.make_async_copy(win, out_ref.at[pl.ds(aligned_row, CK.SUBW), :], sem)
    wr.start(); wr.wait()
probe("D_readback", kD)
