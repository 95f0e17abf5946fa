"""Pallas block-compaction (filter) kernel.

The hand-written counterpart of the filter operator (BASELINE.md north star:
"filter/compaction ... prefix-scan compaction" as Pallas kernels).  Two TPU
facts shape the design:

1. The TPU grid executes SEQUENTIALLY on a core.  Each block therefore writes
   its full (padded) compacted block at its exclusive output offset with a
   dynamic-offset DMA; the garbage tail a block writes past its own count is
   overwritten by the next block's rows.  No masked stores, no atomics.
2. There is no vector scatter.  The within-block stable compaction is a
   permutation applied with the MXU: a one-hot permutation matrix P (built on
   the VPU from the block's prefix-scanned ranks) times the value block, split
   into two 16-bit halves so the f32 matmul is exact for any 32-bit payload.

Phases:
  a. XLA: per-block selected counts -> exclusive block offsets (tiny scan).
  b. Pallas grid over blocks: ranks via lane/sublane prefix sums, P = one-hot,
     compact = P @ [lo16 | hi16], DMA to out[offset : offset + B].

The MXU work is B MACs/row (B = block rows), so small blocks keep this
compute-light; with many columns sharing one P the matmul amortizes further.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import bits as B_

LANES = 128
BLOCK = 256  # rows per block: P is (256, 256) f32 = 256 KB VMEM
SUB = BLOCK // LANES  # sublane rows per block


def _compact_kernel(offsets_ref, data_ref, words_ref, out_ref, scratch, sem):
    i = pl.program_id(0)
    # unpack this block's packed mask words in VMEM (8 words -> 256 bits);
    # word w covers flat elements [w*32, w*32+32), matching row-major order
    w = words_ref[...].reshape(BLOCK // 32, 1)  # (8, 1) uint32
    shifts = lax.broadcasted_iota(jnp.uint32, (BLOCK // 32, 32), 1)
    bits = (w >> shifts) & jnp.uint32(1)
    sel = bits.reshape(SUB, LANES) != 0

    # stable rank of every selected element in row-major order
    lane_idx = lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
    seli = sel.astype(jnp.int32)
    lane_incl = jnp.cumsum(seli, axis=1)  # within-sublane inclusive scan
    row_tot = lane_incl[:, LANES - 1 :]  # (SUB, 1) per-sublane totals
    row_excl = jnp.cumsum(row_tot, axis=0) - row_tot  # exclusive over sublanes
    rank = row_excl + lane_incl - seli  # (SUB, LANES) exclusive rank
    rank_flat = jnp.where(sel, rank, BLOCK - 1 + jnp.zeros_like(rank))

    # one-hot permutation: P[k, j] = 1 iff selected element j has rank k.
    # unselected elements all map to slot BLOCK-1 via the `sel` factor below,
    # so P rows beyond the count are zero except the sink slot; the sink's
    # value is garbage that the next block (or the logical length) masks.
    flat_rank = rank_flat.reshape(1, BLOCK)
    k_iota = lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    p = ((k_iota == flat_rank) & sel.reshape(1, BLOCK)).astype(jnp.float32)

    vals = data_ref[...].reshape(1, BLOCK)
    u = vals.astype(jnp.uint32) if vals.dtype != jnp.uint32 else vals
    lo = (u & jnp.uint32(0xFFFF)).astype(jnp.float32).reshape(BLOCK, 1)
    hi = (u >> jnp.uint32(16)).astype(jnp.float32).reshape(BLOCK, 1)
    halves = jnp.concatenate([lo, hi], axis=1)  # (BLOCK, 2)
    perm = jnp.dot(p, halves, preferred_element_type=jnp.float32)  # (BLOCK, 2)
    out_u = perm[:, 0].astype(jnp.uint32) | (
        perm[:, 1].astype(jnp.uint32) << jnp.uint32(16)
    )
    scratch[...] = out_u.astype(scratch.dtype)

    # element-aligned dynamic-offset DMA into the 1-D output; the tail this
    # block writes past its own count is overwritten by the next block
    # (sequential grid), so no masking is needed.
    off = offsets_ref[i]
    copy = pltpu.make_async_copy(
        scratch,
        out_ref.at[pl.ds(off, BLOCK)],
        sem,
    )
    copy.start()
    copy.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_pallas(
    data: jnp.ndarray,
    mask_words: jnp.ndarray,
    interpret: bool = False,
):
    """Compact selected rows of a 32-bit column to the front.

    data: (n,) 32-bit values, n % 1024 == 0; mask_words: packed uint32.
    Returns (out, count): out has capacity n + BLOCK with the k selected rows
    in rows [0, k) (row-major over an (rows, 128) view).

    NOTE on layout: compaction order here is row-major over the (rows, 128)
    view, matching the flat element order of the 1-D column.
    """
    n = data.shape[0]
    assert n % (SUB * LANES) == 0
    nb = n // BLOCK

    # per-block selected counts from packed-word popcounts (tiny XLA prelude)
    wpb = BLOCK // 32  # words per block
    pc = lax.population_count(mask_words.reshape(nb, wpb))
    counts = jnp.sum(pc, axis=1, dtype=jnp.int32)
    block_off = jnp.cumsum(counts) - counts  # element offsets
    count = jnp.sum(counts)
    out = pl.pallas_call(
        _compact_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wpb), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((BLOCK,), data.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n + BLOCK,), data.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(block_off, data.reshape(-1, LANES), mask_words.reshape(nb, wpb))
    return out, count
