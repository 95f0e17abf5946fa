"""Streaming region-MXU aggregate over CLASS-PARTITIONED keys.

Extends the dense one-hot MXU kernel (`groupby_mxu.py`, domain [0, 4096))
to ANY dense domain: the caller first groups rows by "class" (key >> 12)
— `compute/hash_aggregate._partition_by_class`, stable binary splits built
from the block-compaction kernel — after which every 8192-element chunk
touches only a handful of contiguous-run classes.  This kernel streams the
partitioned rows once, accumulating ONE resident 4096-slot region table
(cnt + per-limb sum lo/hi, (32,128) i32 each) and flushing it to the HBM
output table whenever the class changes; chunks spanning several classes
loop over their runs (a masked one-hot accumulation per run — the
out-of-class rows one-hot to nothing because their hi falls outside
[0, 32)).

Class 0 is the caller's GARBAGE class (dead/padded rows and the
zero-padding the split compactions produce); the caller drops its slots.

Exactness: per-chunk per-class f32 matmul partials are <= 255 * 8192 < 2^24
(nlimb 8-bit limbs), accumulated in s32 split lo16/hi16 across chunks like
groupby_mxu — wait: the region accumulates whole CLASSES, whose row counts
can reach n; the region therefore carries the same split lo16/hi16 s32
planes as groupby_mxu so per-class sums up to 2^47 per limb stay exact.

≙ reference seed: the relaunch-loop reduction
`/root/reference/crates/arithmetic/src/aggregate_kernels.rs:24-52`; the
reference has no group-by — this extends the north-star hash-aggregate
(BASELINE.md "1K-100M distinct keys") beyond the 4096-slot niche.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CHUNK_ROWS = 64  # 8192 elements per streamed chunk
NHI = 32
NLO = 128
SLOTS = NHI * NLO  # 4096 per class
LIMB_BITS = 8


def _make_kernel(nlimb: int, nclass: int):
    nacc = 1 + 2 * nlimb  # cnt + lo/hi per limb

    def kernel(nc_ref, keys_hbm, vals_hbm, *rest):
        outs = rest[:nacc]  # HBM (nclass*NHI, NLO) i32 each
        kbuf, vbuf = rest[nacc], rest[nacc + 1]  # (2, 64, 128)
        regs = rest[nacc + 2 : 2 * nacc + 2]  # (NHI, NLO) i32 VMEM
        zt = rest[2 * nacc + 2]  # (NHI, NLO) zero tile
        sem_k, sem_v, sem_f = rest[2 * nacc + 3 :]

        nchunks = nc_ref[0]
        ii = lax.broadcasted_iota
        iota_sub32 = ii(jnp.int32, (NHI, LANES), 0)
        iota_lane = ii(jnp.int32, (LANES, LANES), 1)
        flat = ii(jnp.int32, (CHUNK_ROWS, LANES), 0) * LANES + ii(
            jnp.int32, (CHUNK_ROWS, LANES), 1
        )
        fzero = jnp.zeros((CHUNK_ROWS, LANES), jnp.float32)
        fone = jnp.ones((CHUNK_ROWS, LANES), jnp.float32)

        # ---- prologue: zero the whole output table -----------------------
        zt[...] = jnp.zeros((NHI, NLO), jnp.int32)

        def zbody(c, carry):
            row0 = pl.multiple_of(c * jnp.int32(NHI), NHI)
            for a in range(nacc):
                cp = pltpu.make_async_copy(
                    zt, outs[a].at[pl.ds(row0, NHI), :], sem_f.at[jnp.int32(a)]
                )
                cp.start()
                cp.wait()
            return carry

        lax.fori_loop(jnp.int32(0), jnp.int32(nclass), zbody, jnp.int32(0))
        for r in regs:
            r[...] = jnp.zeros((NHI, NLO), jnp.int32)

        def rd(i, hbm, buf, sem, slot):
            row0 = pl.multiple_of(i * jnp.int32(CHUNK_ROWS), CHUNK_ROWS)
            return pltpu.make_async_copy(
                hbm.at[pl.ds(row0, CHUNK_ROWS), :], buf.at[slot], sem.at[slot]
            )

        rd(jnp.int32(0), keys_hbm, kbuf, sem_k, jnp.int32(0)).start()
        rd(jnp.int32(0), vals_hbm, vbuf, sem_v, jnp.int32(0)).start()

        def flush(c):
            """Write the region to class c's output rows (sequenced)."""
            row0 = pl.multiple_of(c * jnp.int32(NHI), NHI)
            for a in range(nacc):
                cp = pltpu.make_async_copy(
                    regs[a], outs[a].at[pl.ds(row0, NHI), :], sem_f.at[jnp.int32(a)]
                )
                cp.start()
                cp.wait()
            for a in range(nacc):
                regs[a][...] = jnp.zeros((NHI, NLO), jnp.int32)

        def accumulate(k, v, c_base):
            """Add class-c_base rows of the chunk into the region (one-hot
            of out-of-class rows is all-zero: their hi leaves [0, NHI))."""
            rel = k - c_base * jnp.int32(SLOTS)
            hi = rel >> 7
            ehi_pieces = [
                (
                    iota_sub32
                    == jnp.broadcast_to(hi[c : c + 1, :], (NHI, LANES))
                ).astype(jnp.bfloat16)
                for c in range(CHUNK_ROWS)
            ]
            ehi = jnp.concatenate(ehi_pieces, axis=1)
            loT = k.T & jnp.int32(NLO - 1)
            elo = jnp.concatenate(
                [
                    (
                        jnp.broadcast_to(loT[:, c : c + 1], (LANES, NLO))
                        == iota_lane
                    ).astype(jnp.bfloat16)
                    for c in range(CHUNK_ROWS)
                ],
                axis=0,
            )
            cnt_p = jax.lax.dot_general(
                ehi, elo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            regs[0][...] = regs[0][...] + cnt_p
            for b in range(nlimb):
                limb = (
                    (v >> (LIMB_BITS * b)) & jnp.int32((1 << LIMB_BITS) - 1)
                ).astype(jnp.float32)
                ehi_w = jnp.concatenate(
                    [
                        ehi_pieces[c]
                        * jnp.broadcast_to(
                            limb[c : c + 1, :], (NHI, LANES)
                        ).astype(jnp.bfloat16)
                        for c in range(CHUNK_ROWS)
                    ],
                    axis=1,
                )
                s_p = jax.lax.dot_general(
                    ehi_w, elo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
                regs[1 + b][...] = regs[1 + b][...] + (s_p & jnp.int32(0xFFFF))
                regs[1 + nlimb + b][...] = regs[1 + nlimb + b][...] + (s_p >> 16)

        def fsum(mask):
            return jnp.sum(jnp.where(mask, fone, fzero)).astype(jnp.int32)

        def fextract(vals_i32, pos):
            """vals_i32[flat == pos] as a scalar (positional extract by
            reduction — Mosaic-safe, no VMEM scalar loads)."""
            return jnp.sum(
                jnp.where(flat == pos, vals_i32.astype(jnp.float32), fzero)
            ).astype(jnp.int32)

        def body(i, c_carry):
            m = lax.rem(i, jnp.int32(2))
            rd(i, keys_hbm, kbuf, sem_k, m).wait()
            rd(i, vals_hbm, vbuf, sem_v, m).wait()

            @pl.when(i + 1 < nchunks)
            def _():
                m2 = lax.rem(i + 1, jnp.int32(2))
                rd(i + 1, keys_hbm, kbuf, sem_k, m2).start()
                rd(i + 1, vals_hbm, vbuf, sem_v, m2).start()

            k = kbuf[m]
            v = vbuf[m]
            cls = k >> jnp.int32(12)
            cf = fextract(cls, jnp.int32(0))

            @pl.when(cf != c_carry)
            def _():
                flush(c_carry)

            # per contiguous class run in the chunk: accumulate, and flush
            # unless the run reaches the chunk end (it may continue)
            def run_body(st):
                c_cur, nproc = st
                cnt_run = fsum(cls == c_cur)
                done = nproc + cnt_run
                accumulate(k, v, c_cur)

                @pl.when(done < jnp.int32(CHUNK_ROWS * LANES))
                def _():
                    flush(c_cur)

                c_next = fextract(
                    cls, jnp.minimum(done, jnp.int32(CHUNK_ROWS * LANES - 1))
                )
                return c_next, done

            def run_cond(st):
                _c, nproc = st
                return nproc < jnp.int32(CHUNK_ROWS * LANES)

            c_last, _ = lax.while_loop(run_cond, run_body, (cf, jnp.int32(0)))
            return c_last

        c_final = lax.fori_loop(jnp.int32(0), nchunks, body, jnp.int32(0))
        flush(c_final)

    return kernel


@functools.partial(jax.jit, static_argnames=("nlimb", "nclass", "interpret"))
def groupby_region_pallas(
    keys, vals, nlimb: int, nclass: int, interpret: bool | None = None
):
    """Aggregate vals by CLASS-GROUPED keys in [0, nclass*4096).

    keys: (n,) i32, rows grouped by key>>12 (any class order, each class
    contiguous; class 0 = garbage incl. all zero padding); vals: (n,) i32
    non-negative < 2^(8*nlimb); n % 8192 == 0.  Returns
    (count (nclass*4096,) i32, sum (nclass*4096,) i64).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = keys.shape[0]
    assert n % (CHUNK_ROWS * LANES) == 0
    nchunks = n // (CHUNK_ROWS * LANES)
    nacc = 1 + 2 * nlimb
    kernel = _make_kernel(nlimb, nclass)
    out_shapes = [
        jax.ShapeDtypeStruct((nclass * NHI, NLO), jnp.int32) for _ in range(nacc)
    ]
    scratch = [
        pltpu.VMEM((2, CHUNK_ROWS, LANES), jnp.int32),
        pltpu.VMEM((2, CHUNK_ROWS, LANES), jnp.int32),
    ]
    scratch += [pltpu.VMEM((NHI, NLO), jnp.int32) for _ in range(nacc)]
    scratch += [pltpu.VMEM((NHI, NLO), jnp.int32)]  # zero tile
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((nacc,)),
    ]
    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nacc,
        scratch_shapes=scratch,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.full((1,), nchunks, jnp.int32),
        keys.astype(jnp.int32).reshape(-1, LANES),
        vals.astype(jnp.int32).reshape(-1, LANES),
    )
    cnt = outs[0].reshape(-1)
    total = jnp.zeros((nclass * SLOTS,), jnp.int64)
    for b in range(nlimb):
        lo = outs[1 + b].reshape(-1).astype(jnp.int64)
        hi = outs[1 + nlimb + b].reshape(-1).astype(jnp.int64)
        total = total + ((hi << 16) + lo) * (1 << (LIMB_BITS * b))
    return cnt, total
