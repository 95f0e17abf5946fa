"""Pallas block-compaction (filter) kernel.

The hand-written counterpart of the filter operator (BASELINE.md north star:
"filter/compaction ... prefix-scan compaction" as Pallas kernels).  TPU facts
that shape the design:

1. The TPU grid executes SEQUENTIALLY on a core, so blocks may overlap their
   output regions: later blocks overwrite earlier blocks' garbage tails.
2. There is no vector scatter.  The within-block stable compaction is the
   LSB-first log-shift hole-filling network: each selected element's final
   displacement is processed bit by bit; at stage s the elements whose
   remaining displacement has bit s set shift left by 2^s.  Conflict-free for
   monotone routings (displacements non-decreasing in index, targets strictly
   increasing) — fuzz-verified over thousands of random masks.
3. HBM DMA slices must be 1024-element-tile aligned.  Each block writes a
   1024-aligned WINDOW.  v2 design: the block's data conceptually sits at
   window offset TILE, and the window-alignment rotation is FOLDED INTO the
   network — every selected element's displacement is
   (TILE - shift) + idx - rank, so one 16-stage left-shift network lands rows
   directly at window position rank + shift.  (v1 ran a 13-stage compaction
   plus a separate 10-stage rotation plus a 13-stage rolled prefix sum — 36
   VPU stages; v2 runs 16 stages + two MXU matmuls.)
4. Rank prefix sums ride the MXU: within-row inclusive cumsum = sel @ T128
   (upper-triangular ones), row offsets = Lstrict @ rowsums — bf16 inputs with
   f32 accumulation (counts <= 256 are exact in bf16, block sums exact in f32).
5. Hole/at-home encoding: remaining displacement 0 means "never moves, never
   overwritten" (the network property guarantees no mover lands on a live
   at-home row), so no separate occupancy plane is carried — only (cur, rem)
   roll each stage.

Phases per block (one in-kernel fori_loop; the sequential loop IS the
exclusive prefix scan of block counts):
  a. DMA data into the window tail + mask block;
  b. MXU rank; displacement encode; 16-stage hole-filling network;
  c. head-merge with the previous block's aligned tail tile (read back from
     the output; the in-order loop with blocking waits makes that coherent);
  d. one aligned DMA write of the whole window.

Mosaic portability notes baked in below: jnp.roll (concat+slice lowering)
instead of pltpu.roll (fails verification here); int32 carried state instead
of i1/i8 vectors (unsupported truncations); no weak-typed literals in selects
(infinite convert recursion); f32 (not int) full reductions; lax.div instead
of // on traced scalars; int32 fori bounds (i64 converts recurse).

≙ reference seeds: `/root/reference/crates/routines/src/take.rs:9-55` (gather)
composed with a mask prefix-scan — the reference has no compaction operator;
this is the north-star filter kernel built from its take/put/merge semantics.
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
HEADR = TILE // LANES  # head rows of a window (8)
MAX_BLOCK = 32768  # rows per block (power of two, multiple of TILE)


def _roll(x, shift, axis):
    """Static roll via pltpu.roll: a single hardware shift where jnp.roll's
    concat+slice lowering costs 2-3 ops.  The shift amount MUST reach Mosaic
    as i32: under the library's jax_enable_x64=True a bare Python int lowers
    as an i64 scalar and `tpu.dynamic_rotate` rejects it ("operand #1 must be
    32-bit signless integer") — the round-2 fleet-wide crash."""
    return pltpu.roll(x, jnp.int32(shift % x.shape[axis]), axis)


def _flat_roll_left(x, b):
    """y[flat] = x[flat + b] over the row-major (rows, LANES) view (wraps; the
    wrapped-in values are inert: a mover's remaining displacement never
    exceeds its position, so positions < 2^s never trigger a stage-s move)."""
    k, r = divmod(b, LANES)
    rows = x.shape[0]
    if r == 0:
        return _roll(x, rows - k, 0)
    lr = _roll(x, LANES - r, 1)  # lr[row, c] = x[row, (c+r)%LANES]
    nx = _roll(lr, rows - 1 - k, 0)
    same = _roll(lr, (rows - k) % rows, 0) if k else lr
    c = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(c < LANES - r, same, nx)


def _flat_roll_right(x, b):
    """y[flat] = x[flat - b] (wraps; caller masks)."""
    k, r = divmod(b, LANES)
    rows = x.shape[0]
    if r == 0:
        return _roll(x, k, 0)
    rr = _roll(x, r, 1)  # rr[row, c] = x[row, (c-r)%LANES]
    pv = _roll(rr, 1 + k, 0)
    same = _roll(rr, k, 0) if k else rr
    c = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(c >= r, same, pv)


def _make_kernel(block: int):
    subl = block // LANES
    win = block + TILE
    subw = win // LANES
    nbits = (win - 1).bit_length()

    def kernel(nb_ref, data_hbm, mask_hbm, out_ref, winb, mbuf, prev, sem_d, sem_m, sem_p, sem_w):
        n_blocks = nb_ref[0]
        ii = lax.broadcasted_iota
        # loop-invariant constants (MXU triangles + index planes)
        t128 = (ii(jnp.int32, (LANES, LANES), 0) <= ii(jnp.int32, (LANES, LANES), 1)).astype(
            jnp.float32
        ).astype(jnp.bfloat16)
        ones128 = jnp.ones((LANES, LANES), jnp.bfloat16)
        lstrict = (ii(jnp.int32, (subl, subl), 1) < ii(jnp.int32, (subl, subl), 0)).astype(
            jnp.float32
        ).astype(jnp.bfloat16)
        idxb = ii(jnp.int32, (subl, LANES), 0) * LANES + ii(jnp.int32, (subl, LANES), 1)
        widx8 = ii(jnp.int32, (HEADR, LANES), 0) * LANES + ii(jnp.int32, (HEADR, LANES), 1)

        def body(i, off):
            row0 = pl.multiple_of(i * jnp.int32(subl), subl)
            rd_d = pltpu.make_async_copy(
                data_hbm.at[pl.ds(row0, subl), :], winb.at[pl.ds(HEADR, subl), :], sem_d
            )
            rd_m = pltpu.make_async_copy(
                mask_hbm.at[pl.ds(row0, subl), :], mbuf, sem_m
            )
            rd_d.start()
            rd_m.start()

            # lax.div, not //: jnp's signed floordiv lowers through an
            # unsupported convert chain in this Mosaic version (off is >= 0)
            aligned_row = pl.multiple_of(
                lax.div(off, jnp.int32(TILE)) * jnp.int32(HEADR), HEADR
            )
            shift = off - aligned_row * jnp.int32(LANES)  # in [0, TILE)

            # read back the 1024-aligned tile this window's head overlaps
            rd_p = pltpu.make_async_copy(
                out_ref.at[pl.ds(aligned_row, HEADR), :], prev, sem_p
            )
            rd_p.start()

            rd_m.wait()
            sel = mbuf[...]
            self16 = sel.astype(jnp.float32).astype(jnp.bfloat16)
            # MXU rank: within-row inclusive cumsum + exclusive row offsets
            within = jnp.dot(self16, t128, preferred_element_type=jnp.float32)
            rowsum = jnp.dot(self16, ones128, preferred_element_type=jnp.float32)
            rowoff = jnp.dot(
                lstrict, rowsum.astype(jnp.bfloat16), preferred_element_type=jnp.float32
            )
            rank_excl = (within + rowoff).astype(jnp.int32) - sel
            # float accumulation: an int jnp.sum detours through an i64
            # convert Mosaic can't lower (exact: cnt <= block << 2^24)
            cnt = jnp.sum(self16.astype(jnp.float32)).astype(jnp.int32)

            # displacement encode: 0 = hole or at-home (inert), else the
            # remaining left-shift to window position rank + shift
            rem_b = jnp.where(
                sel == 1,
                idxb - rank_excl + (jnp.int32(TILE) - shift),
                jnp.zeros_like(idxb),
            )

            rd_d.wait()
            cur = winb[...]  # head rows hold stale data; rem=0 keeps them inert
            rem = jnp.concatenate(
                [jnp.zeros((HEADR, LANES), jnp.int32), rem_b], axis=0
            )
            for s in range(nbits):
                bit = 1 << s
                nxt_cur = _flat_roll_left(cur, bit)
                nxt_rem = _flat_roll_left(rem, bit)
                moved_in = ((nxt_rem >> s) & 1) == 1
                my_move = ((rem >> s) & 1) == 1
                cur = jnp.where(moved_in, nxt_cur, cur)
                rem = jnp.where(
                    moved_in,
                    nxt_rem - bit,
                    jnp.where(my_move, jnp.zeros_like(rem), rem),
                )

            rd_p.wait()
            head = jnp.where(widx8 < shift, prev[...], cur[:HEADR, :])
            winb[...] = jnp.concatenate([head, cur[HEADR:, :]], axis=0)

            wr = pltpu.make_async_copy(
                winb, out_ref.at[pl.ds(aligned_row, subw), :], sem_w
            )
            wr.start()
            wr.wait()
            return off + cnt

        # int32 loop bounds: python-int bounds make the index i64 under x64,
        # and i64 ops recurse forever in this Mosaic version's convert lowering
        lax.fori_loop(jnp.int32(0), n_blocks, body, jnp.int32(0))

    return kernel, subw, win


def _pick_block(n: int) -> int:
    block = MAX_BLOCK
    while n % block:
        block //= 2
    assert block >= 8192, f"n must be a multiple of 8192, got {n}"
    return block


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_pallas(
    data: jnp.ndarray,
    mask_words: jnp.ndarray,
    interpret: bool = False,
):
    """Compact selected rows of a 32-bit column to the front (flat order).

    data: (n,) 32-bit values, n % 8192 == 0; mask_words: packed uint32
    (bits >= n zero).  Returns (out, count): out has capacity n + block + TILE
    with the selected rows dense at [0, count).  For f32 data bitcast to u32
    first.
    """
    n = data.shape[0]
    block = _pick_block(n)
    nb = n // block
    kernel, subw, win = _make_kernel(block)

    count = jnp.sum(lax.population_count(mask_words), dtype=jnp.int32)
    from ...utils import bits as B_

    mask_i32 = B_.unpack_bits(mask_words).astype(jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_blocks
            pl.BlockSpec(memory_space=pl.ANY),  # data (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # mask (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((subw, LANES), data.dtype),  # window (data staged in tail)
            pltpu.VMEM((block // LANES, LANES), jnp.int32),  # mask block
            pltpu.VMEM((HEADR, LANES), data.dtype),  # prev head tile
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct(((n + win) // LANES, LANES), data.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.full((1,), nb, jnp.int32), data.reshape(-1, LANES), mask_i32.reshape(-1, LANES))
    return out.reshape(-1), count
