"""MXU one-hot hash-aggregate kernel: GROUP BY dense u32 keys, SUM/COUNT.

The sort-based groupby (`compute/hash_aggregate.py`) is robust but sort-bound
(~0.1-0.3 Grows/s at 128M rows).  When the key domain is small — keys in
[0, 4096) — the aggregation is a histogram/scatter-add, and the TPU-native
scatter-add is a ONE-HOT MATMUL on the MXU:

  hi = key >> 7 (32 candidates);  lo = key & 127 (128 candidates)
  count[hi, lo]  += Ehi (32, F) @ Elo (F, 128)          F = 1024 elements
  sum_b [hi, lo] += Ehi (32, F) @ Elo_w[b] (F, 128)     b-th 8-bit value limb

The (32, 128) matmul output IS the 4096-slot table.  Operand/precision
choices are measured, not guessed (tools/mosaic_probe.py + scratch probes on
the target chip):

- bf16 operands, f32 accumulation: int8 matmuls lower ~3.5x slower than
  bf16 here, and "f32" MXU matmuls are internally bf16-decomposed on this
  toolchain (--xla_allow_excess_precision), so they are NOT integer-exact.
  bf16 is exact through 2^8, so values decompose into 8-bit limbs: products
  are exact and the f32-accumulated per-group sums are <= 2^8 * 1024 = 2^18
  — exact.  One limb covers 8-bit values.
- 128-lane matmul outputs: N=32 outputs run ~3x slower than N=128.
- selects stay in the i32/f32 domain with one final convert per operand:
  i8-domain selects force an i1 relayout Mosaic rejects; i8 vector
  multiplies and adds fail to legalize outright.
- one transpose per 8-row tile puts elements on sublanes for the Elo side;
  per-piece transposes dominated earlier revisions.

Per-group f32 partials convert to s32 and accumulate exactly; per-block
partials fold into split lo16/hi16 s32 accumulators so row counts up to 2^31
and value sums up to 2^63 stay exact (recomposed in int64 outside).

Scope (callers gate and fall back to the sort path otherwise):
  keys in [0, 4096), non-negative values, no nulls, SUM/COUNT/MEAN.

≙ reference seed: the Sum tree-reduction
`/root/reference/crates/arithmetic/src/aggregate_kernels.rs:7-52` — its
workgroup shared-memory reduce becomes the MXU systolic reduce; the reference
has no group-by, this is the north-star hash-aggregate (BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

LANES = 128
# rows per MXU matmul group (group_rows*128 elements per one-hot matmul):
# measured on the v5e at 134M rows, 1K keys, nlimb=1 (round 4): 8 -> 1.36
# Grows/s, 16 -> 1.91, 32 -> 2.30, 64 -> 2.68, 128 -> 2.97 — the kernel was
# bound by per-group loop overhead, not one-hot construction
GROUP_ROWS = 128

#: "direct" = one-hot via bool->bf16 astype (2 ops per piece); "select" =
#: r3's f32 where + convert (5 ops per piece, the Mosaic-safe fallback)
_ELO = _os.environ.get("ARROW_TPU_GROUPBY_ELO", "direct")
#: elements per MXU matmul group = _GR * 128 (loop-overhead amortization knob)
_GR = int(_os.environ.get("ARROW_TPU_GROUPBY_ROWS", str(GROUP_ROWS)))
NHI = 32
NLO = 128
SLOTS = NHI * NLO  # 4096
LIMB_BITS = 8  # bf16 exact-integer boundary: products <= 255, f32-accumulated group sums <= 2^18
MAX_BLOCK = 32768


def _pick_block(n: int) -> int:
    block = MAX_BLOCK
    while n % block:
        block //= 2
    assert block >= 8192, f"n must be a multiple of 8192, got {n}"
    return block


def nlimbs_for_bits(valbits: int) -> int:
    return max(1, -(-valbits // LIMB_BITS))


def _make_kernel(block: int, nlimb: int):
    subl = block // LANES
    group_rows = min(_GR, subl)  # small blocks (8192 rows) cap the group
    ngroups = subl // group_rows

    def kernel(nb_ref, len_ref, keys_hbm, vals_hbm, cnt_out, *rest):
        kbuf, vbuf, cnt_acc = rest[2 * nlimb], rest[2 * nlimb + 1], rest[2 * nlimb + 2]
        sum_lo = rest[2 * nlimb + 3 : 3 * nlimb + 3]
        sum_hi = rest[3 * nlimb + 3 : 4 * nlimb + 3]
        sem_k, sem_v = rest[4 * nlimb + 3], rest[4 * nlimb + 4]

        n_blocks = nb_ref[0]
        ii = lax.broadcasted_iota
        iota_sub32 = ii(jnp.int32, (NHI, LANES), 0)
        iota_lane = ii(jnp.int32, (LANES, LANES), 1)

        cnt_acc[...] = jnp.zeros((NHI, NLO), jnp.int32)
        for b in range(nlimb):
            sum_lo[b][...] = jnp.zeros((NHI, NLO), jnp.int32)
            sum_hi[b][...] = jnp.zeros((NHI, NLO), jnp.int32)

        def rd(i, hbm, buf, sem, slot):
            row0 = pl.multiple_of(i * jnp.int32(subl), subl)
            return pltpu.make_async_copy(
                hbm.at[pl.ds(row0, subl), :], buf.at[slot], sem.at[slot]
            )

        rd(jnp.int32(0), keys_hbm, kbuf, sem_k, jnp.int32(0)).start()
        rd(jnp.int32(0), vals_hbm, vbuf, sem_v, jnp.int32(0)).start()

        def body(i, carry):
            m = lax.rem(i, jnp.int32(2))
            rd(i, keys_hbm, kbuf, sem_k, m).wait()
            rd(i, vals_hbm, vbuf, sem_v, m).wait()

            @pl.when(i + 1 < n_blocks)
            def _():
                m2 = lax.rem(i + 1, jnp.int32(2))
                rd(i + 1, keys_hbm, kbuf, sem_k, m2).start()
                rd(i + 1, vals_hbm, vbuf, sem_v, m2).start()

            # ONE block-level sentinel pass replaces r3's per-piece length
            # gate (which cost 2 extra (128,128) ops on every elo cond):
            # rows beyond the logical length get key SLOTS, whose hi one-hot
            # column is all-zero (hi8 compares UNMASKED below), so dead rows
            # contribute to neither counts nor sums
            flat_row = (
                i * jnp.int32(subl)
                + ii(jnp.int32, (subl, LANES), 0)
            ) * jnp.int32(LANES) + ii(jnp.int32, (subl, LANES), 1)
            kbuf[m] = jnp.where(
                flat_row < len_ref[0], kbuf[m], jnp.int32(SLOTS)
            )

            def group(g, accs):
                cnt_p, sums_p = accs
                r0 = pl.multiple_of(g * jnp.int32(group_rows), group_rows)
                k8 = kbuf[m, pl.ds(r0, group_rows), :]
                v8 = vbuf[m, pl.ds(r0, group_rows), :]
                hi8 = k8 >> 7  # NO & mask: sentinel keys fall outside [0,NHI)

                # Ehi (32 hi, 1024 elem): fused compare->bf16 per source row.
                # Limb VALUES fold into ehi (the SMALL operand), not elo: the
                # per-limb weighted operand is (32, 1024) instead of v2's
                # (1024, 128) elo_w — 4x less materialized one-hot traffic per
                # limb (the kernel is VMEM-bandwidth-bound on these operands)
                # and the value-side transpose disappears.
                ehi_pieces = [
                    (
                        iota_sub32
                        == jnp.broadcast_to(hi8[c : c + 1, :], (NHI, LANES))
                    ).astype(jnp.bfloat16)
                    for c in range(group_rows)
                ]
                ehi = jnp.concatenate(ehi_pieces, axis=1)
                # ONE transpose per tile puts elements on sublanes; Elo pieces
                # are (128, 1)->lane broadcasts of its columns.  No length
                # gate here any more (sentinel keys are dead via ehi).
                kT8 = k8.T  # (128, GROUP_ROWS)
                loT = kT8 & jnp.int32(NLO - 1)
                conds = [
                    jnp.broadcast_to(loT[:, c : c + 1], (LANES, NLO)) == iota_lane
                    for c in range(group_rows)
                ]
                if _ELO == "direct":
                    elo = jnp.concatenate(
                        [c_.astype(jnp.bfloat16) for c_ in conds], axis=0
                    )
                else:
                    zero = jnp.zeros((LANES, NLO), jnp.float32)
                    one = jnp.ones((LANES, NLO), jnp.float32)
                    elo = jnp.concatenate(
                        [jnp.where(c_, one, zero) for c_ in conds], axis=0
                    ).astype(jnp.bfloat16)
                # each per-group f32 dot partial is exact: bounded by
                # (2^LIMB_BITS - 1) * GROUP_ROWS * LANES = 255 * 128 * 128
                # < 2^24, the f32 integer-exact range (bound scales with
                # GROUP_ROWS and LIMB_BITS — re-check before widening
                # either); accumulate across groups in s32
                cnt_p = cnt_p + jax.lax.dot_general(
                    ehi, elo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
                new_sums = []
                for b in range(nlimb):
                    limb8 = (
                        (v8 >> (LIMB_BITS * b)) & jnp.int32((1 << LIMB_BITS) - 1)
                    ).astype(jnp.float32)
                    ehi_w = jnp.concatenate(
                        [
                            ehi_pieces[c]
                            * jnp.broadcast_to(
                                limb8[c : c + 1, :], (NHI, LANES)
                            ).astype(jnp.bfloat16)
                            for c in range(group_rows)
                        ],
                        axis=1,
                    )
                    new_sums.append(
                        sums_p[b]
                        + jax.lax.dot_general(
                            ehi_w, elo, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(jnp.int32)
                    )
                return cnt_p, tuple(new_sums)

            cnt_p, sums_p = lax.fori_loop(
                jnp.int32(0),
                jnp.int32(ngroups),
                group,
                (
                    jnp.zeros((NHI, NLO), jnp.int32),
                    tuple(
                        jnp.zeros((NHI, NLO), jnp.int32) for _ in range(nlimb)
                    ),
                ),
            )
            # fold per-block s32 partials (limb sums <= 2^29) into the split
            # lo16/hi16 accumulators that stay exact across all blocks
            cnt_acc[...] = cnt_acc[...] + cnt_p
            for b in range(nlimb):
                sum_lo[b][...] = sum_lo[b][...] + (sums_p[b] & jnp.int32(0xFFFF))
                sum_hi[b][...] = sum_hi[b][...] + (sums_p[b] >> 16)
            return carry

        lax.fori_loop(jnp.int32(0), n_blocks, body, jnp.int32(0))

        cnt_out[...] = cnt_acc[...]
        for b in range(nlimb):
            rest[b][...] = sum_lo[b][...]  # sum low-16 output planes
            rest[nlimb + b][...] = sum_hi[b][...]  # sum high-16 output planes

    return kernel


@functools.partial(jax.jit, static_argnames=("nlimb", "length", "interpret"))
def groupby_dense_pallas(
    keys, vals, nlimb: int = 3, length: int | None = None, interpret: bool | None = None
):
    """Aggregate vals by dense keys in [0, SLOTS): returns (count, sum) tables.

    keys: (n,) u32/i32, all in [0, 4096); vals: (n,) u32/i32, non-negative,
    < 2^(8*nlimb); n % 8192 == 0; rows >= `length` (buffer padding) are
    excluded.  Returns (count (4096,) int32, sum (4096,) int64) indexed by
    key; exact integer arithmetic.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = keys.shape[0]
    block = _pick_block(n)
    nb = n // block
    kernel = _make_kernel(block, nlimb)
    subl = block // LANES

    out_shapes = [jax.ShapeDtypeStruct((NHI, NLO), jnp.int32)] * (1 + 2 * nlimb)
    scratch = [
        pltpu.VMEM((2, subl, LANES), jnp.int32),  # keys
        pltpu.VMEM((2, subl, LANES), jnp.int32),  # vals
        pltpu.VMEM((NHI, NLO), jnp.int32),  # count accumulator
    ]
    scratch += [pltpu.VMEM((NHI, NLO), jnp.int32) for _ in range(2 * nlimb)]
    scratch += [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))]

    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + 2 * nlimb),
        scratch_shapes=scratch,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.full((1,), nb, jnp.int32),
        jnp.full((1,), length if length is not None else n, jnp.int32),
        keys.astype(jnp.int32).reshape(-1, LANES),
        vals.astype(jnp.int32).reshape(-1, LANES),
    )
    count = outs[0].reshape(-1)
    total = jnp.zeros((SLOTS,), jnp.int64)
    for b in range(nlimb):
        lo = outs[1 + b].reshape(-1).astype(jnp.int64)
        hi = outs[1 + nlimb + b].reshape(-1).astype(jnp.int64)
        total = total + ((hi << 16) + lo) * (1 << (LIMB_BITS * b))
    return count, total
