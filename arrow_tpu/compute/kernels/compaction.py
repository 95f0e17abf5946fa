"""Pallas block-compaction (filter) kernel.

The hand-written counterpart of the filter operator (BASELINE.md north star:
"filter/compaction ... prefix-scan compaction" as Pallas kernels).  TPU facts
that shape the design:

1. The TPU grid executes SEQUENTIALLY on a core, so blocks may overlap their
   output regions: later blocks overwrite earlier blocks' garbage tails.
2. There is no vector scatter.  The within-block stable compaction is the
   LSB-first log-shift hole-filling network: each selected element's final
   displacement d = index - rank is processed bit by bit; at stage s the
   elements whose remaining displacement has bit s set shift left by 2^s.
   Conflict-free (a mover's target is always a hole — fuzz-verified over 3000
   random masks), so each stage is one flat roll + selects on the VPU.
3. HBM DMA slices must be 1024-element-tile aligned.  Each block therefore
   writes a 1024-aligned WINDOW: its compacted rows are rotated right by
   (offset mod 1024) — ten conditional binary rolls on a traced scalar — and
   the first (offset mod 1024) elements are re-filled with the previous
   block's tile, read back from the output (sequential grid makes that sound).

Phases:
  a. XLA prelude: per-block popcounts -> exclusive block offsets (tiny scan);
  b. Pallas grid over blocks: rank prefix sums, log-shift compaction, dynamic
     rotate, head merge, one aligned DMA write per block.

Mosaic portability notes baked in below: jnp.roll (concat+slice lowering)
instead of pltpu.roll (fails verification here); int32 carried state instead
of i1/i8 vectors (unsupported truncations); no weak-typed literals in selects
(infinite convert recursion).
"""

from __future__ import annotations

import functools
import sys

import jax

if sys.getrecursionlimit() < 20000:
    sys.setrecursionlimit(20000)
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 1024  # HBM DMA alignment granule (elements)
BLOCK = 8192  # rows per block (power of two, multiple of TILE)
LOGB = BLOCK.bit_length() - 1
WPB = BLOCK // 32  # mask words per block
SUBL = BLOCK // LANES  # 64
WIN = BLOCK + TILE  # aligned output window
SUBW = WIN // LANES  # 72


def _flat_roll_left(x, b):
    """y[flat] = x[flat + b] over the row-major (rows, LANES) view (wraps; the
    caller masks wrapped positions)."""
    k, r = divmod(b, LANES)
    rows = x.shape[0]
    if r == 0:
        return jnp.roll(x, rows - k, axis=0)
    lr = jnp.roll(x, LANES - r, axis=1)  # lr[row, c] = x[row, (c+r)%LANES]
    nx = jnp.roll(lr, rows - 1 - k, axis=0)
    same = jnp.roll(lr, (rows - k) % rows, axis=0) if k else lr
    c = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(c < LANES - r, same, nx)


def _flat_roll_right(x, b):
    """y[flat] = x[flat - b] (wraps; caller masks)."""
    k, r = divmod(b, LANES)
    rows = x.shape[0]
    if r == 0:
        return jnp.roll(x, k, axis=0)
    rr = jnp.roll(x, r, axis=1)  # rr[row, c] = x[row, (c-r)%LANES]
    pv = jnp.roll(rr, 1 + k, axis=0)
    same = jnp.roll(rr, k, axis=0) if k else rr
    c = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(c >= r, same, pv)


def _compact_block(sel, cur):
    """The in-VMEM stable compaction of one (SUBL, LANES) block (traced)."""
    rows_i = lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 0)
    cols_i = lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 1)
    idx = rows_i * LANES + cols_i  # flat row-major index

    # inclusive prefix sum of sel (Hillis-Steele over the flat order)
    ps = sel
    for s in range(LOGB):
        bit = 1 << s
        ps = ps + jnp.where(idx >= bit, _flat_roll_right(ps, bit), jnp.zeros_like(ps))
    rank = ps - sel

    # log-shift hole-filling compaction (int32 carried state)
    occ = sel
    rem = jnp.where(sel == 1, idx - rank, jnp.zeros_like(idx))
    one = jnp.ones_like(occ)
    zero = jnp.zeros_like(occ)
    for s in range(LOGB):
        bit = 1 << s
        nxt_cur = _flat_roll_left(cur, bit)
        nxt_occ = _flat_roll_left(occ, bit)
        nxt_rem = _flat_roll_left(rem, bit)
        moved_in = (nxt_occ == 1) & (((nxt_rem >> s) & 1) == 1) & (idx < (BLOCK - bit))
        my_move = (occ == 1) & (((rem >> s) & 1) == 1)
        cur = jnp.where(moved_in, nxt_cur, cur)
        occ = jnp.where(moved_in, one, jnp.where(my_move, zero, occ))
        rem = jnp.where(moved_in, nxt_rem - bit, rem)
    return cur


def _compact_kernel(nb_ref, data_hbm, mask_hbm, out_ref, dbuf, mbuf, win, prev, sem_d, sem_m, sem_p, sem_w):
    """Grid-free mega-kernel: loops over all blocks internally with explicit
    DMAs (this environment's remote compiler rejects any gridded pallas_call;
    an in-kernel fori_loop + manual DMA pipeline is the portable form — and
    the more explicit TPU idiom anyway).

    Block output offsets are the fori carry — the sequential loop IS the
    exclusive prefix scan of the block counts (an SMEM offsets array would
    exceed SMEM for multi-million-row inputs)."""
    n_blocks = nb_ref[0]

    widx = (
        lax.broadcasted_iota(jnp.int32, (SUBW, LANES), 0) * LANES
        + lax.broadcasted_iota(jnp.int32, (SUBW, LANES), 1)
    )

    def body(i, off):
        row0 = pl.multiple_of(i * jnp.int32(SUBL), SUBL)
        rd_d = pltpu.make_async_copy(
            data_hbm.at[pl.ds(row0, SUBL), :], dbuf, sem_d
        )
        rd_m = pltpu.make_async_copy(
            mask_hbm.at[pl.ds(row0, SUBL), :], mbuf, sem_m
        )
        rd_d.start()
        rd_m.start()

        # lax.div, not //: jnp's signed floordiv lowers through an unsupported
        # convert chain that recurses in this Mosaic version (off is >= 0)
        aligned_row = pl.multiple_of(
            lax.div(off, jnp.int32(TILE)) * jnp.int32(TILE // LANES), TILE // LANES
        )
        shift = off - aligned_row * jnp.int32(LANES)  # in [0, TILE)

        # read back the 1024-aligned tile this window's head overlaps (holds
        # prior blocks' rows at positions < shift); in-order loop + blocking
        # waits make the readback coherent
        rd_p = pltpu.make_async_copy(
            out_ref.at[pl.ds(aligned_row, TILE // LANES), :], prev, sem_p
        )
        rd_p.start()

        rd_d.wait()
        rd_m.wait()
        sel = mbuf[...]
        # float accumulation: under x64 an int jnp.sum detours through an i64
        # convert Mosaic can't lower (exact: cnt <= BLOCK << 2^24)
        cnt = jnp.sum(sel.astype(jnp.float32)).astype(jnp.int32)
        cur = _compact_block(sel, dbuf[...])

        # place compacted rows at window flat [0, BLOCK), then rotate right by
        # `shift` using conditional binary rolls on the traced scalar
        window = jnp.concatenate(
            [cur, jnp.zeros((SUBW - SUBL, LANES), cur.dtype)], axis=0
        )
        for s in range(TILE.bit_length() - 1):  # shift < 1024 -> 10 bits
            bit = 1 << s
            rolled = _flat_roll_right(window, bit)
            window = jnp.where(((shift >> s) & 1) == 1, rolled, window)

        rd_p.wait()
        head = jnp.concatenate(
            [prev[...], jnp.zeros((SUBW - TILE // LANES, LANES), cur.dtype)], axis=0
        )
        win[...] = jnp.where(widx < shift, head, window)

        wr = pltpu.make_async_copy(win, out_ref.at[pl.ds(aligned_row, SUBW), :], sem_w)
        wr.start()
        wr.wait()
        return off + cnt

    # int32 loop bounds: under x64 python-int bounds make the index i64, and
    # every i64 op recurses forever in this Mosaic version's convert lowering
    lax.fori_loop(jnp.int32(0), n_blocks, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_pallas(
    data: jnp.ndarray,
    mask_words: jnp.ndarray,
    interpret: bool = False,
):
    """Compact selected rows of a 32-bit column to the front (flat order).

    data: (n,) 32-bit values, n % BLOCK == 0; mask_words: packed uint32
    (bits >= n zero).  Returns (out, count): out has capacity n + WIN with the
    selected rows dense at [0, count).  For f32 data bitcast to u32 first.
    """
    n = data.shape[0]
    assert n % BLOCK == 0, f"n must be a multiple of {BLOCK}"
    nb = n // BLOCK

    count = jnp.sum(lax.population_count(mask_words), dtype=jnp.int32)
    from ...utils import bits as B_

    mask_i32 = B_.unpack_bits(mask_words).astype(jnp.int32)
    out = pl.pallas_call(
        _compact_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # block offsets
            pl.BlockSpec(memory_space=pl.ANY),  # data (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # mask (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((SUBL, LANES), data.dtype),  # data block buffer
            pltpu.VMEM((SUBL, LANES), jnp.int32),  # mask block buffer
            pltpu.VMEM((SUBW, LANES), data.dtype),  # aligned window
            pltpu.VMEM((TILE // LANES, LANES), data.dtype),  # prev head tile
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct(((n + WIN) // LANES, LANES), data.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.full((1,), nb, jnp.int32), data.reshape(-1, LANES), mask_i32.reshape(-1, LANES))
    return out.reshape(-1), count
