"""Pallas LSB radix-sort pass: stable dual-output bit split with stitched
dual-buffer input — the chained form of `compaction3.split_multi_pallas`.

BASELINE.md names the algorithm ("radix sort: 1B-row u32/i64 key + payload,
stable multi-pass LSB"); the reference's compositional seed is the host-side
multi-pass reduction loop `/root/reference/crates/arithmetic/src/
aggregate_kernels.rs:24-52` (launch a pass, feed its output to the next).
The reference itself has no sort — this is north-star operator work.

One PASS = one stable binary partition of every row by a runtime key bit
(bit==0 rows to the S stream, bit==1 to U), all planes routed together.
Chaining passes LSB-first over the significant key bits yields a stable
sort (each pass is stable, so pass k orders ties of bit k by the previous
passes' order).  Design deltas vs `split_multi_pallas` that make the CHAIN
cheap (measured r4: a split pass cost ~16.7 ms at 134M x 2 planes, of which
~5 ms was the XLA roll-combine of the two output halves and ~4 ms the
tail-zero epilogue writes):

1. **Stitched read, no combine**: a pass reads its predecessor's (S, U)
   output pair DIRECTLY as the logical array concat(S[:c0], U[:n-c0]),
   with c0 (the predecessor's S count) as a runtime SMEM scalar.  Only one
   block straddles the c0 boundary; every other block issues a single
   full-size DMA from whichever buffer covers it (conditional starts with
   matching conditional waits).  The stitch itself is ~5 VPU ops: one
   dynamic lane roll by c0 mod 128, one dynamic row roll, a two-row lane
   select, and the S/U boundary select.
2. **No tail-zero epilogue**: mid-chain outputs carry garbage past their
   counts (the next pass never reads past them); the sort's final combine
   re-establishes the library's zero-padding invariant once.
3. The bit and c0 are device scalars, so ONE compiled program serves every
   pass of every bit width; the chain groups up to CHUNK passes per
   dispatch (donated inputs) to amortize the deployment tunnel's ~8 ms
   per-dispatch host latency, with single un-fused passes at large n where
   a fused chunk's un-aliasable intermediate generations exceed HBM.
4. Dynamic-size window writes: each block writes only the rows holding its
   data (halves write traffic at 50/50 splits); sorts finish with ONE
   fused combine+decode+mask dispatch per plane group.

The per-block move is the proven v4 two-level compaction (searchsorted lane
gather — first two probes static — + row-granular hole-filling network) run
once per output stream; see `compaction3.py` for the correctness argument.
Measured v5e (134M x u32 k+v): 14.8 ms/pass device; 31-bit library sort
525-533 ms vs lax.sort 586-611.  A 4-stream 2-bit kernel exists behind
ARROW_TPU_RADIX_R=4 (measured slower per bit: 16.5 vs 14.8 ms).  Full
anatomy: docs/sort_design_notes.md + docs/bandwidth_notes.md.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compaction import _flat_roll_left
from .kutils import taa_lanes

import os as _os

LANES = 128
TILE = 1024
HEADR = TILE // LANES
#: rows per block — A/B measured on v5e r5 (16K/32K/64K: see STATUS.md)
MAX_BLOCK = int(_os.environ.get("ARROW_TPU_RADIX_BLOCK", "32768"))
NSLOT = int(_os.environ.get("ARROW_TPU_RADIX_NSLOT", "3"))
RU_PAD = 8  # extra bufU rows so the +1-row lane straddle always fits

#: perf-floor probes (WRONG OUTPUT — A/B experiments only):
#:   "none"     = skip searchsorted + network (DMA/stitch/rank skeleton)
#:   "nosearch" = keep the network, skip the searchsorted (src = lane iota)
#:   "oneside"  = full move for S only, U side skipped entirely
_NET = _os.environ.get("ARROW_TPU_RADIX_NET", "full")

#: dynamic-size window writes: each block writes only the rows that contain
#: its data ([aligned_row, row(off+cnt)]) instead of the full subw window —
#: halves write traffic at ~50/50 splits.  Interpret mode can't discharge
#: dynamic-size DMA slices, so the caller forces it off there.
_WSHRINK_ENV = _os.environ.get("ARROW_TPU_RADIX_WSHRINK", "1") == "1"


def _make_radix_kernel(block: int, nv: int, wshrink: bool):
    _WSHRINK = wshrink and _WSHRINK_ENV
    subl = block // LANES
    win = block + TILE
    subw = win // LANES
    nbits_row = (subw - 1).bit_length()
    ru = subl + RU_PAD  # U-side read window rows

    def kernel(sc_ref, *refs):
        # sc_ref (SMEM): [n_blocks, bit, c0]
        # refs: prevS[nv], prevU[nv] | outS[nv], outU[nv], cnt_out |
        #   bufS[nv] (2, subl, L), bufU[nv] (2, ru, L),
        #   winS[nv] (NSLOT, subw, L), winU[nv] (NSLOT, subw, L),
        #   sem_dS (2, nv), sem_dU (2, nv), sem_wS (NSLOT, nv),
        #   sem_wU (NSLOT, nv)
        k = 0
        prevS = refs[k : k + nv]; k += nv
        prevU = refs[k : k + nv]; k += nv
        outS = refs[k : k + nv]; k += nv
        outU = refs[k : k + nv]; k += nv
        cnt_out = refs[k]; k += 1
        bufS = refs[k : k + nv]; k += nv
        bufU = refs[k : k + nv]; k += nv
        winS = refs[k : k + nv]; k += nv
        winU = refs[k : k + nv]; k += nv
        sem_dS = refs[k]; k += 1
        sem_dU = refs[k]; k += 1
        sem_wS = refs[k]; k += 1
        sem_wU = refs[k]

        n_blocks = sc_ref[0]
        bitv = sc_ref[1]
        c0 = sc_ref[2]
        c0r = lax.div(c0, jnp.int32(LANES))
        c0l = lax.rem(c0, jnp.int32(LANES))

        ii = lax.broadcasted_iota
        t128 = (
            (ii(jnp.int32, (LANES, LANES), 0) <= ii(jnp.int32, (LANES, LANES), 1))
            .astype(jnp.float32)
            .astype(jnp.bfloat16)
        )
        ones128 = jnp.ones((LANES, LANES), jnp.bfloat16)
        lstrict = (
            (ii(jnp.int32, (subl, subl), 1) < ii(jnp.int32, (subl, subl), 0))
            .astype(jnp.float32)
            .astype(jnp.bfloat16)
        )
        widx8 = ii(jnp.int32, (HEADR, LANES), 0) * LANES + ii(
            jnp.int32, (HEADR, LANES), 1
        )
        lane_b = ii(jnp.int32, (subl, LANES), 1)
        row_b = ii(jnp.int32, (subl, LANES), 0)
        flat_b = row_b * jnp.int32(LANES) + lane_b

        cap_rows = jnp.int32(prevU[0].shape[0])

        def any_s(i):  # block i needs rows below the c0 boundary
            return i * jnp.int32(block) < c0

        def any_u(i):  # block i needs rows at/above the boundary
            return (i + jnp.int32(1)) * jnp.int32(block) > c0

        def rd_s(i, p):
            m = lax.rem(i, jnp.int32(2))
            row0 = pl.multiple_of(i * jnp.int32(subl), subl)
            return pltpu.make_async_copy(
                prevS[p].at[pl.ds(row0, subl), :],
                bufS[p].at[m],
                sem_dS.at[m, jnp.int32(p)],
            )

        def rd_u(i, p):
            m = lax.rem(i, jnp.int32(2))
            # rows covering U-flat [i*block - c0 - 128, ...): u0 = row of the
            # boundary-adjusted window start minus one (lane straddle)
            u0 = i * jnp.int32(subl) - c0r - jnp.int32(1)
            u0c = jnp.clip(u0, jnp.int32(0), cap_rows - jnp.int32(ru))
            return pltpu.make_async_copy(
                prevU[p].at[pl.ds(u0c, ru), :],
                bufU[p].at[m],
                sem_dU.at[m, jnp.int32(p)],
            )

        def start_reads(i):
            @pl.when(any_s(i))
            def _():
                for p in range(nv):
                    rd_s(i, p).start()

            @pl.when(any_u(i))
            def _():
                for p in range(nv):
                    rd_u(i, p).start()

        def wait_reads(i):
            @pl.when(any_s(i))
            def _():
                for p in range(nv):
                    rd_s(i, p).wait()

            @pl.when(any_u(i))
            def _():
                for p in range(nv):
                    rd_u(i, p).wait()

        def stitched(i, m):
            """The block's nv logical planes: concat(S[:c0], U)[i*block ...]."""
            u0 = i * jnp.int32(subl) - c0r - jnp.int32(1)
            u0c = jnp.clip(u0, jnp.int32(0), cap_rows - jnp.int32(ru))
            delta = u0 - u0c  # <= 0; nonzero only near the boundary
            # row-roll amount for A[w] = L[w + delta + 1] (garbage wraps are
            # masked by the flat<c0 select)
            s_a = lax.rem(
                lax.rem(-delta - jnp.int32(1), jnp.int32(ru)) + jnp.int32(ru),
                jnp.int32(ru),
            )
            below = flat_b + i * jnp.int32(block) < c0
            lane_lt = lane_b < c0l
            outs = []
            for p in range(nv):
                llu = pltpu.roll(bufU[p][m], c0l, 1)  # lanes: x[(q-c0l)%128]
                a = pltpu.roll(llu, s_a, 0)
                b = pltpu.roll(a, jnp.int32(1), 0)
                uvals = jnp.where(lane_lt, b[:subl, :], a[:subl, :])
                outs.append(jnp.where(below, bufS[p][m], uvals))
            return outs

        def wr(winb, outs, sem_wr, i, off, p, rows=None):
            s = lax.rem(i, jnp.int32(NSLOT))
            aligned_row = pl.multiple_of(
                lax.div(off, jnp.int32(TILE)) * jnp.int32(HEADR), HEADR
            )
            if rows is None:
                return pltpu.make_async_copy(
                    winb[p].at[s],
                    outs[p].at[pl.ds(aligned_row, subw), :],
                    sem_wr.at[s, jnp.int32(p)],
                )
            return pltpu.make_async_copy(
                winb[p].at[s, pl.ds(jnp.int32(0), rows), :],
                outs[p].at[pl.ds(aligned_row, rows), :],
                sem_wr.at[s, jnp.int32(p)],
            )

        start_reads(jnp.int32(0))

        def side_move(i, s, sp, off, off_prev, C, rowoff_i, cntb, data,
                      winb, outs, sem_wr, blockcnt, rows_prev):
            """One v4 gather+row-network compaction of this block's rows
            against inclusive per-row ranks C (sorted per row); `data` is the
            list of nv stitched (subl, LANES) planes."""
            aligned_row = pl.multiple_of(
                lax.div(off, jnp.int32(TILE)) * jnp.int32(HEADR), HEADR
            )
            ar_prev = pl.multiple_of(
                lax.div(off_prev, jnp.int32(TILE)) * jnp.int32(HEADR), HEADR
            )
            shift = off - aligned_row * jnp.int32(LANES)
            delta = pl.multiple_of(aligned_row - ar_prev, HEADR)
            pheads = [winb[p][sp, pl.ds(delta, HEADR), :] for p in range(nv)]

            base = shift + rowoff_i
            jp = (lane_b - base) & jnp.int32(127)
            if _NET in ("none", "nosearch"):
                src = lane_b  # WRONG OUTPUT: perf-floor probe
            else:
                # branchless searchsorted; the first two probe positions are
                # STATIC lanes (pos=0: lane 63; pos in {0,64}: lane 31/95),
                # so lane-broadcast column slices replace the two most
                # expensive taa gathers (measured: the search was ~31% of
                # the pass, ~0.35 ms per gather step at 2^27)
                c63 = C[:, 63:64]
                pos = jnp.where(c63 <= jp, jnp.int32(64), jnp.int32(0))
                c31 = C[:, 31:32]
                c95 = C[:, 95:96]
                probe2 = jnp.where(pos == jnp.int32(64), c95, c31)
                pos = pos + jnp.where(
                    probe2 <= jp, jnp.int32(32), jnp.int32(0)
                )
                for kk in (16, 8, 4, 2, 1):
                    cval = taa_lanes(C, pos + jnp.int32(kk - 1))
                    pos = pos + jnp.where(
                        cval <= jp, jnp.int32(kk), jnp.int32(0)
                    )
                src = jnp.minimum(pos, jnp.int32(127))
            live = jp < cntb
            destrow = (base + jp) >> jnp.int32(7)
            drow = row_b + jnp.int32(HEADR) - destrow
            rem_b = jnp.where(live, drow, jnp.zeros_like(drow))

            cur = [
                jnp.concatenate(
                    [winb[p][s, :HEADR, :], taa_lanes(data[p], src)], axis=0
                )
                for p in range(nv)
            ]
            rem = jnp.concatenate(
                [jnp.zeros((HEADR, LANES), jnp.int32), rem_b], axis=0
            )
            if _NET != "none":
                for st in range(nbits_row):
                    bit = 1 << st
                    nxt_rem = _flat_roll_left(rem, bit * LANES)
                    moved_in = ((nxt_rem >> st) & 1) == 1
                    my_move = ((rem >> st) & 1) == 1
                    cur = [
                        jnp.where(moved_in, _flat_roll_left(c, bit * LANES), c)
                        for c in cur
                    ]
                    rem = jnp.where(
                        moved_in,
                        nxt_rem - bit,
                        jnp.where(my_move, jnp.zeros_like(rem), rem),
                    )

            take_prev = widx8 < shift
            for p in range(nv):
                head = jnp.where(take_prev, pheads[p], cur[p][:HEADR, :])
                winb[p][s] = jnp.concatenate([head, cur[p][HEADR:, :]], axis=0)

            rows = None
            if _WSHRINK:
                rows = jnp.maximum(
                    lax.div(shift + blockcnt + jnp.int32(127), jnp.int32(128)),
                    jnp.int32(1),
                )

            @pl.when(i > 0)
            def _():
                for p in range(nv):
                    wr(winb, outs, sem_wr, i - 1, off_prev, p,
                       rows_prev if _WSHRINK else None).wait()

            for p in range(nv):
                wr(winb, outs, sem_wr, i, off, p, rows).start()
            return rows if _WSHRINK else jnp.int32(subw)

        def body(i, state):
            offS, offS_prev, offU, offU_prev, rowsS_prev, rowsU_prev = state
            s = lax.rem(i, jnp.int32(NSLOT))
            sp = lax.rem(i + jnp.int32(NSLOT - 1), jnp.int32(NSLOT))
            m = lax.rem(i, jnp.int32(2))

            wait_reads(i)
            data = stitched(i, m)
            sel = jnp.where(
                ((data[0] >> bitv) & jnp.int32(1)) == 0,
                jnp.ones((subl, LANES), jnp.int32),
                jnp.zeros((subl, LANES), jnp.int32),
            )
            self16 = sel.astype(jnp.float32).astype(jnp.bfloat16)
            within = jnp.dot(self16, t128, preferred_element_type=jnp.float32)
            rowsum = jnp.dot(self16, ones128, preferred_element_type=jnp.float32)
            rowoff = jnp.dot(
                lstrict, rowsum.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            cnt = jnp.sum(self16.astype(jnp.float32)).astype(jnp.int32)
            Ci = within.astype(jnp.int32)
            cntb = rowsum.astype(jnp.int32)
            rowoff_i = rowoff.astype(jnp.int32)
            Cu = (lane_b + jnp.int32(1)) - Ci
            cntb_u = jnp.int32(LANES) - cntb
            rowoff_u = row_b * jnp.int32(LANES) - rowoff_i

            @pl.when(i + 1 < n_blocks)
            def _():
                start_reads(i + 1)

            cnt_u = jnp.int32(block) - cnt
            rowsS = side_move(i, s, sp, offS, offS_prev, Ci, rowoff_i, cntb,
                              data, winS, outS, sem_wS, cnt, rowsS_prev)
            rowsU = rowsU_prev
            if _NET != "oneside":
                rowsU = side_move(i, s, sp, offU, offU_prev, Cu, rowoff_u,
                                  cntb_u, data, winU, outU, sem_wU, cnt_u,
                                  rowsU_prev)
            return offS + cnt, offS, offU + cnt_u, offU, rowsS, rowsU

        offS, offS_prev, offU, offU_prev, rowsS_l, rowsU_l = lax.fori_loop(
            jnp.int32(0), n_blocks, body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
             jnp.int32(subw), jnp.int32(subw)),
        )
        for p in range(nv):
            wr(winS, outS, sem_wS, n_blocks - 1, offS_prev, p,
               rowsS_l if _WSHRINK else None).wait()
            if _NET != "oneside":
                wr(winU, outU, sem_wU, n_blocks - 1, offU_prev, p,
                   rowsU_l if _WSHRINK else None).wait()
        cnt_out[...] = jnp.full((HEADR, LANES), jnp.int32(0)) + offS

    return kernel


def _make_radix4_kernel(block: int, nv: int, wshrink: bool):
    """4-stream (2-bit) radix pass: digit = bitA | bitB<<1 of the key plane,
    reading FOUR predecessor streams with three stitch boundaries.

    Two bits per pass halve the read+write traffic per sorted bit (the DMA
    floor was 48% of the 2-way pass, r5 sweep) while the per-stream move
    cost per bit stays flat (R/log2(R) is equal at R=2 and R=4).  An odd
    final bit runs with bitB == bitA: digit in {0, 3}, streams 1 and 2
    empty (their windows write one minimal row per block).
    """
    _WSHRINK = wshrink and _WSHRINK_ENV
    subl = block // LANES
    win = block + TILE
    subw = win // LANES
    nbits_row = (subw - 1).bit_length()
    ru = subl + RU_PAD
    R = 4

    def kernel(sc_ref, *refs):
        # sc_ref (SMEM): [n_blocks, bitA, bitB, B1, B2, B3]
        # refs: prev[4][nv] | out[4][nv], cnt_out |
        #   buf[4][nv] (2, ru, L), win[4][nv] (NSLOT, subw, L),
        #   sem_d (2, 4*nv), sem_w[4] (NSLOT, nv)
        k = 0
        prev = [refs[k + t * nv : k + (t + 1) * nv] for t in range(R)]
        k += R * nv
        outs = [refs[k + t * nv : k + (t + 1) * nv] for t in range(R)]
        k += R * nv
        cnt_out = refs[k]; k += 1
        bufs = [refs[k + t * nv : k + (t + 1) * nv] for t in range(R)]
        k += R * nv
        wins = [refs[k + t * nv : k + (t + 1) * nv] for t in range(R)]
        k += R * nv
        sem_d = refs[k]; k += 1
        sem_w = refs[k : k + R]

        n_blocks = sc_ref[0]
        bitA = sc_ref[1]
        bitB = sc_ref[2]
        nrow_total = n_blocks * jnp.int32(subl)
        B = [jnp.int32(0), sc_ref[3], sc_ref[4], sc_ref[5]]
        Bend = B[1:] + [nrow_total * jnp.int32(LANES)]

        ii = lax.broadcasted_iota
        t128 = (
            (ii(jnp.int32, (LANES, LANES), 0) <= ii(jnp.int32, (LANES, LANES), 1))
            .astype(jnp.float32)
            .astype(jnp.bfloat16)
        )
        ones128 = jnp.ones((LANES, LANES), jnp.bfloat16)
        lstrict = (
            (ii(jnp.int32, (subl, subl), 1) < ii(jnp.int32, (subl, subl), 0))
            .astype(jnp.float32)
            .astype(jnp.bfloat16)
        )
        widx8 = ii(jnp.int32, (HEADR, LANES), 0) * LANES + ii(
            jnp.int32, (HEADR, LANES), 1
        )
        lane_b = ii(jnp.int32, (subl, LANES), 1)
        row_b = ii(jnp.int32, (subl, LANES), 0)
        flat_b = row_b * jnp.int32(LANES) + lane_b

        cap_rows = jnp.int32(prev[0][0].shape[0])

        def any_t(t, i):
            return ((i + jnp.int32(1)) * jnp.int32(block) > B[t]) & (
                i * jnp.int32(block) < Bend[t]
            )

        def rd_t(t, i, p):
            m = lax.rem(i, jnp.int32(2))
            u0 = i * jnp.int32(subl) - lax.div(B[t], jnp.int32(LANES)) - jnp.int32(1)
            u0c = jnp.clip(u0, jnp.int32(0), cap_rows - jnp.int32(ru))
            return pltpu.make_async_copy(
                prev[t][p].at[pl.ds(u0c, ru), :],
                bufs[t][p].at[m],
                sem_d.at[m, jnp.int32(t * nv + p)],
            )

        def start_reads(i):
            for t in range(R):
                @pl.when(any_t(t, i))
                def _(t=t):
                    for p in range(nv):
                        rd_t(t, i, p).start()

        def wait_reads(i):
            for t in range(R):
                @pl.when(any_t(t, i))
                def _(t=t):
                    for p in range(nv):
                        rd_t(t, i, p).wait()

        def stitched(i, m):
            fg_lo = flat_b + i * jnp.int32(block)
            outsv = [None] * nv
            for t in range(R):
                c0l = lax.rem(B[t], jnp.int32(LANES))
                u0 = (
                    i * jnp.int32(subl)
                    - lax.div(B[t], jnp.int32(LANES))
                    - jnp.int32(1)
                )
                u0c = jnp.clip(u0, jnp.int32(0), cap_rows - jnp.int32(ru))
                delta = u0 - u0c
                s_a = lax.rem(
                    lax.rem(-delta - jnp.int32(1), jnp.int32(ru)) + jnp.int32(ru),
                    jnp.int32(ru),
                )
                lane_lt = lane_b < c0l
                for p in range(nv):
                    llu = pltpu.roll(bufs[t][p][m], c0l, 1)
                    a = pltpu.roll(llu, s_a, 0)
                    b = pltpu.roll(a, jnp.int32(1), 0)
                    v = jnp.where(lane_lt, b[:subl, :], a[:subl, :])
                    if t == 0:
                        outsv[p] = v
                    else:
                        outsv[p] = jnp.where(fg_lo >= B[t], v, outsv[p])
            return outsv

        def wr(t, i, off, p, rows=None):
            s = lax.rem(i, jnp.int32(NSLOT))
            aligned_row = pl.multiple_of(
                lax.div(off, jnp.int32(TILE)) * jnp.int32(HEADR), HEADR
            )
            if rows is None:
                return pltpu.make_async_copy(
                    wins[t][p].at[s],
                    outs[t][p].at[pl.ds(aligned_row, subw), :],
                    sem_w[t].at[s, jnp.int32(p)],
                )
            return pltpu.make_async_copy(
                wins[t][p].at[s, pl.ds(jnp.int32(0), rows), :],
                outs[t][p].at[pl.ds(aligned_row, rows), :],
                sem_w[t].at[s, jnp.int32(p)],
            )

        start_reads(jnp.int32(0))

        def side_move(t, i, s, sp, off, off_prev, C, rowoff_i, cntb, data,
                      blockcnt, rows_prev):
            aligned_row = pl.multiple_of(
                lax.div(off, jnp.int32(TILE)) * jnp.int32(HEADR), HEADR
            )
            ar_prev = pl.multiple_of(
                lax.div(off_prev, jnp.int32(TILE)) * jnp.int32(HEADR), HEADR
            )
            shift = off - aligned_row * jnp.int32(LANES)
            delta = pl.multiple_of(aligned_row - ar_prev, HEADR)
            pheads = [wins[t][p][sp, pl.ds(delta, HEADR), :] for p in range(nv)]

            base = shift + rowoff_i
            jp = (lane_b - base) & jnp.int32(127)
            c63 = C[:, 63:64]
            pos = jnp.where(c63 <= jp, jnp.int32(64), jnp.int32(0))
            probe2 = jnp.where(pos == jnp.int32(64), C[:, 95:96], C[:, 31:32])
            pos = pos + jnp.where(probe2 <= jp, jnp.int32(32), jnp.int32(0))
            for kk in (16, 8, 4, 2, 1):
                cval = taa_lanes(C, pos + jnp.int32(kk - 1))
                pos = pos + jnp.where(cval <= jp, jnp.int32(kk), jnp.int32(0))
            src = jnp.minimum(pos, jnp.int32(127))
            live = jp < cntb
            destrow = (base + jp) >> jnp.int32(7)
            drow = row_b + jnp.int32(HEADR) - destrow
            rem_b = jnp.where(live, drow, jnp.zeros_like(drow))

            cur = [
                jnp.concatenate(
                    [wins[t][p][s, :HEADR, :], taa_lanes(data[p], src)], axis=0
                )
                for p in range(nv)
            ]
            rem = jnp.concatenate(
                [jnp.zeros((HEADR, LANES), jnp.int32), rem_b], axis=0
            )
            for st in range(nbits_row):
                bit = 1 << st
                nxt_rem = _flat_roll_left(rem, bit * LANES)
                moved_in = ((nxt_rem >> st) & 1) == 1
                my_move = ((rem >> st) & 1) == 1
                cur = [
                    jnp.where(moved_in, _flat_roll_left(c, bit * LANES), c)
                    for c in cur
                ]
                rem = jnp.where(
                    moved_in,
                    nxt_rem - bit,
                    jnp.where(my_move, jnp.zeros_like(rem), rem),
                )

            take_prev = widx8 < shift
            for p in range(nv):
                head = jnp.where(take_prev, pheads[p], cur[p][:HEADR, :])
                wins[t][p][s] = jnp.concatenate(
                    [head, cur[p][HEADR:, :]], axis=0
                )

            rows = None
            if _WSHRINK:
                rows = jnp.maximum(
                    lax.div(shift + blockcnt + jnp.int32(127), jnp.int32(128)),
                    jnp.int32(1),
                )

            @pl.when(i > 0)
            def _():
                for p in range(nv):
                    wr(t, i - 1, off_prev, p,
                       rows_prev if _WSHRINK else None).wait()

            for p in range(nv):
                wr(t, i, off, p, rows).start()
            return rows if _WSHRINK else jnp.int32(subw)

        def body(i, state):
            offs, off_prevs, rows_prevs = state
            s = lax.rem(i, jnp.int32(NSLOT))
            sp = lax.rem(i + jnp.int32(NSLOT - 1), jnp.int32(NSLOT))
            m = lax.rem(i, jnp.int32(2))

            wait_reads(i)
            data = stitched(i, m)
            key = data[0]
            digit = ((key >> bitA) & jnp.int32(1)) + (
                ((key >> bitB) & jnp.int32(1)) * jnp.int32(2)
            )

            new_offs, new_prevs, new_rows = [], [], []
            for d in range(R):
                sel = jnp.where(
                    digit == jnp.int32(d),
                    jnp.ones((subl, LANES), jnp.int32),
                    jnp.zeros((subl, LANES), jnp.int32),
                )
                self16 = sel.astype(jnp.float32).astype(jnp.bfloat16)
                within = jnp.dot(
                    self16, t128, preferred_element_type=jnp.float32
                )
                rowsum = jnp.dot(
                    self16, ones128, preferred_element_type=jnp.float32
                )
                rowoff = jnp.dot(
                    lstrict, rowsum.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                cnt = jnp.sum(self16.astype(jnp.float32)).astype(jnp.int32)
                if d == 0:
                    # start reads for i+1 once the first digit's control is
                    # issued (all digits share the stitched data)
                    @pl.when(i + 1 < n_blocks)
                    def _():
                        start_reads(i + 1)
                rows_d = side_move(
                    d, i, s, sp, offs[d], off_prevs[d],
                    within.astype(jnp.int32), rowoff.astype(jnp.int32),
                    rowsum.astype(jnp.int32), data, cnt, rows_prevs[d],
                )
                new_offs.append(offs[d] + cnt)
                new_prevs.append(offs[d])
                new_rows.append(rows_d)
            return tuple(new_offs), tuple(new_prevs), tuple(new_rows)

        zero4 = tuple(jnp.int32(0) for _ in range(R))
        offs, off_prevs, rows_lasts = lax.fori_loop(
            jnp.int32(0), n_blocks, body,
            (zero4, zero4, tuple(jnp.int32(subw) for _ in range(R))),
        )
        for t in range(R):
            for p in range(nv):
                wr(t, n_blocks - 1, off_prevs[t], p,
                   rows_lasts[t] if _WSHRINK else None).wait()
        # cumulative boundaries of the output streams at lanes 0, 1, 2
        li = ii(jnp.int32, (HEADR, LANES), 1)
        c1 = offs[0]
        c2 = offs[0] + offs[1]
        c3 = offs[0] + offs[1] + offs[2]
        zero_p = jnp.zeros((HEADR, LANES), jnp.int32)
        cnt_out[...] = jnp.where(
            li == 0,
            zero_p + c1,
            jnp.where(li == 1, zero_p + c2, jnp.where(li == 2, zero_p + c3, zero_p)),
        )

    return kernel


def _pick_block(n: int) -> int:
    block = MAX_BLOCK
    while n % block:
        block //= 2
    assert block >= 8192, f"n must be a multiple of 8192, got {n}"
    return block


def cap_rows_for(n: int) -> int:
    """Output buffer rows for a logical length n (same slack as the split
    kernel: one window of overrun beyond the data rows)."""
    block = _pick_block(n)
    return (n + block + TILE) // LANES + (block + TILE) // LANES


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _radix4_pass_call(streams, bounds, bitA, bitB, n, interpret):
    """One 4-stream radix pass.  streams: tuple of 4 tuples of nv cap-shaped
    i32 planes; bounds: 3 cumulative input boundaries (device i32).  Returns
    (out_streams, out_bounds) with the output digit streams and their
    cumulative boundaries."""
    streams = tuple(tuple(s) for s in streams)
    nv = len(streams[0])
    assert 1 <= nv <= 8
    block = _pick_block(n)
    nb = n // block
    subl = block // LANES
    subw = (block + TILE) // LANES
    ru = subl + RU_PAD
    kernel = _make_radix4_kernel(block, nv, wshrink=not interpret)

    scratch = (
        [pltpu.VMEM((2, ru, LANES), jnp.int32) for _ in range(4 * nv)]
        + [pltpu.VMEM((NSLOT, subw, LANES), jnp.int32) for _ in range(4 * nv)]
        + [pltpu.SemaphoreType.DMA((2, 4 * nv))]
        + [pltpu.SemaphoreType.DMA((NSLOT, nv)) for _ in range(4)]
    )
    out_rows = cap_rows_for(n)
    out_shapes = [
        jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32)
        for _ in range(4 * nv)
    ] + [jax.ShapeDtypeStruct((HEADR, LANES), jnp.int32)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (4 * nv) + [
        pl.BlockSpec(memory_space=pltpu.VMEM)
    ]
    sc = jnp.stack(
        [
            jnp.int32(nb),
            jnp.asarray(bitA, jnp.int32),
            jnp.asarray(bitB, jnp.int32),
            jnp.asarray(bounds[0], jnp.int32),
            jnp.asarray(bounds[1], jnp.int32),
            jnp.asarray(bounds[2], jnp.int32),
        ]
    )
    flat_in = [p for s in streams for p in s]
    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (4 * nv),
        out_specs=out_specs,
        scratch_shapes=scratch,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(sc, *flat_in)
    cnts = outs[-1]
    new_streams = tuple(
        tuple(outs[t * nv : (t + 1) * nv]) for t in range(4)
    )
    return new_streams, (cnts[0, 0], cnts[0, 1], cnts[0, 2])


@functools.partial(
    jax.jit, static_argnames=("n", "k", "interpret"), donate_argnums=(0,)
)
def _radix4_multipass_call(streams, bounds, bits, n, k, interpret):
    """k fused 4-stream passes (2k bits) in one dispatch; bits is a (2k,)
    i32 array of (bitA, bitB) pairs.  Input streams are DONATED (see
    `_radix_multipass_call`)."""
    for j in range(k):
        streams, bounds = _radix4_pass_call(
            streams, bounds, bits[2 * j], bits[2 * j + 1], n=n,
            interpret=interpret,
        )
    return streams, bounds


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _radix_pass_call(planesS, planesU, c0, bit, n, interpret):
    """One radix pass over cap-shaped (rows, LANES) i32 planes.

    Logical input: concat(S[:c0], U[:n-c0]) (flat).  Returns (outS, outU,
    count) where count is the number of bit==0 rows; outputs carry garbage
    past their counts (chain-internal form — callers combine at the end).
    """
    planesS = tuple(planesS)
    planesU = tuple(planesU)
    nv = len(planesS)
    assert 1 <= nv <= 8
    block = _pick_block(n)
    nb = n // block
    subl = block // LANES
    subw = (block + TILE) // LANES
    ru = subl + RU_PAD
    kernel = _make_radix_kernel(block, nv, wshrink=not interpret)

    scratch = (
        [pltpu.VMEM((2, subl, LANES), jnp.int32) for _ in range(nv)]
        + [pltpu.VMEM((2, ru, LANES), jnp.int32) for _ in range(nv)]
        + [pltpu.VMEM((NSLOT, subw, LANES), jnp.int32) for _ in range(2 * nv)]
        + [
            pltpu.SemaphoreType.DMA((2, nv)),
            pltpu.SemaphoreType.DMA((2, nv)),
            pltpu.SemaphoreType.DMA((NSLOT, nv)),
            pltpu.SemaphoreType.DMA((NSLOT, nv)),
        ]
    )
    out_rows = cap_rows_for(n)
    out_shapes = [
        jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32) for _ in range(2 * nv)
    ] + [jax.ShapeDtypeStruct((HEADR, LANES), jnp.int32)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (2 * nv) + [
        pl.BlockSpec(memory_space=pltpu.VMEM)
    ]
    sc = jnp.stack(
        [jnp.int32(nb), jnp.asarray(bit, jnp.int32), jnp.asarray(c0, jnp.int32)]
    )
    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (2 * nv),
        out_specs=out_specs,
        scratch_shapes=scratch,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(sc, *planesS, *planesU)
    count = outs[-1][0, 0]
    return tuple(outs[:nv]), tuple(outs[nv : 2 * nv]), count


@functools.partial(jax.jit, static_argnames=("rows",))
def _to_cap(plane, rows):
    """Pad a flat (n,) plane to the chain's (rows, LANES) cap shape."""
    x = plane
    if x.dtype != jnp.int32:
        x = lax.bitcast_convert_type(x, jnp.int32)
    n = x.shape[0]
    x = x.reshape(-1, LANES)
    return jnp.pad(x, ((0, rows - n // LANES), (0, 0)))


#: passes fused per dispatch: the axon tunnel costs ~8 ms of host latency
#: PER jit dispatch (r5 device trace: a 31-pass chain carried ~250 ms of
#: non-device time), so the chain groups up to CHUNK identical passes into
#: one compiled program (same Pallas kernel instantiated k times — unlike
#: the r4 mixed-kernel composites, this shape compiles cleanly)
CHUNK = int(_os.environ.get("ARROW_TPU_RADIX_CHUNK", "4"))


@functools.partial(
    jax.jit, static_argnames=("n", "k", "interpret"), donate_argnums=(0, 1)
)
def _radix_multipass_call(planesS, planesU, c0, bits, n, k, interpret):
    """k chained passes in ONE dispatch; bits is a (k,) i32 array.  Inputs
    are DONATED: a fused multi-pass program otherwise holds every
    intermediate (S, U) generation live and exhausts HBM at 2^27 x 2 planes
    (callers must not reuse the passed buffers — the chain never does; its
    FIRST pass runs un-fused because there S and U alias one buffer)."""
    for j in range(k):
        planesS, planesU, c0 = _radix_pass_call(
            planesS, planesU, c0, bits[j], n=n, interpret=interpret
        )
    return planesS, planesU, c0


def radix_sort_chain_parts(planes, bits, n: int, interpret: bool | None = None,
                           precapped: bool = False):
    """Stable LSB radix sort of flat 32-bit planes by plane 0's bits,
    returning the RAW chain state (streams, bounds): streams is a tuple of R
    stream-buffer tuples (one buffer per plane) and bounds the R-1 cumulative
    stream boundaries; the sorted order is the boundary-delimited stream
    concatenation per plane (see `combine_parts`).  Callers fuse their own
    decode / masking into the combine so the chain epilogue is ONE pass.

    planes: tuple of (n,) 32-bit arrays (plane 0 = the key in an unsigned
    bit-sortable encoding); bits: iterable of bit positions, LSB-first;
    n % 8192 == 0.  Bits run PAIRWISE through the 4-stream 2-bit pass
    kernel (an odd final bit duplicates itself: digit in {0, 3}), with up
    to CHUNK passes fused per dispatch.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    planes = tuple(planes)
    rows = cap_rows_for(n)
    bits = [int(b) for b in bits]
    if not bits:
        S = tuple(_to_cap(p, rows) for p in planes)
        return (S,), ()
    # Radix width selection: the 4-stream (2-bit) kernel was built to halve
    # per-bit DMA traffic, but MEASURED on the v5e (r5) it runs 16.5 ms/bit
    # vs the 2-stream kernel's 14.8 — the per-stream window maintenance and
    # per-digit rank matmuls outweigh the read/write saving — and it doubles
    # the chain's HBM steady state (4 x nplanes cap buffers; OOMs 2^27 x 2
    # planes alongside ~2 GB of caller context).  The 2-stream chain is
    # therefore the default; ARROW_TPU_RADIX_R=4 opts the experiment in.
    forced_r = _os.environ.get("ARROW_TPU_RADIX_R")
    use4 = forced_r == "4"
    if not use4:
        return _chain_parts_2way(planes, bits, n, rows, interpret, precapped)
    S = tuple(planes) if precapped else tuple(_to_cap(p, rows) for p in planes)
    # pair the bits LSB-first; an odd tail pairs with itself
    pairs = [
        (bits[i], bits[i + 1] if i + 1 < len(bits) else bits[i])
        for i in range(0, len(bits), 2)
    ]
    streams = (S, S, S, S)
    nn = jnp.int32(n)
    bounds = (nn, nn, nn)  # everything in stream 0
    # first pass un-fused: its four input streams alias ONE buffer set,
    # which the donating multipass call must never see
    streams, bounds = _radix4_pass_call(
        streams, bounds, jnp.int32(pairs[0][0]), jnp.int32(pairs[0][1]),
        n=n, interpret=interpret,
    )
    i = 1
    chunk = max(CHUNK, 1)
    while i < len(pairs):
        group = pairs[i : i + chunk]
        i += len(group)
        if len(group) == 1:
            streams, bounds = _radix4_pass_call(
                streams, bounds, jnp.int32(group[0][0]),
                jnp.int32(group[0][1]), n=n, interpret=interpret,
            )
        else:
            flat_bits = [b for pr in group for b in pr]
            streams, bounds = _radix4_multipass_call(
                streams, bounds, jnp.asarray(flat_bits, jnp.int32), n,
                len(group), interpret,
            )
    return streams, bounds


def _chain_parts_2way(planes, bits, n, rows, interpret, precapped=False):
    """The 2-stream chain (half the HBM steady state of the 4-stream form),
    in the same (streams, bounds) return format.

    Large states (S+U beyond ~6 GB) run SINGLE passes instead of fused
    multipass chunks: a fused chunk's intermediate generations cannot alias
    its arguments, and at 537M rows the chunk program alone exceeds HBM
    (AOT: "program 8.00G + arguments 8.00G").  Donating the singles does
    NOT help: XLA protects the aliased pallas outputs by COPYING all
    inputs, re-adding the 8 GB as HLO temps (measured).  The honest
    single-chip k+v maximum is where 8 cap buffers fit: n ~= 3*2^27.
    """
    S = tuple(planes) if precapped else tuple(_to_cap(p, rows) for p in planes)
    U = S
    c0 = jnp.int32(n)
    big_state = 2 * len(planes) * rows * LANES * 4 > 6e9
    first = True
    i = 0
    chunk = 1 if big_state else max(CHUNK, 1)
    while i < len(bits):
        group = bits[i : i + (1 if first else chunk)]
        i += len(group)
        if len(group) == 1:
            # the first step always runs un-donated/un-fused: S and U alias
            # one buffer there, which donation must never see
            S, U, c0 = _radix_pass_call(
                S, U, c0, jnp.int32(group[0]), n=n, interpret=interpret
            )
        else:
            S, U, c0 = _radix_multipass_call(
                S, U, c0, jnp.asarray(group, jnp.int32), n, len(group),
                interpret,
            )
        first = False
    return (S, U), (c0,)


def combine_parts(plane_streams, bounds, n: int):
    """Boundary-delimited stream concatenation for ONE plane's stream
    buffers (cap-shaped), traceable — use inside a fused epilogue program.
    plane_streams: tuple of R buffers; bounds: R-1 cumulative boundaries."""
    idx = lax.broadcasted_iota(jnp.int32, (n,), 0)
    out = plane_streams[0].reshape(-1)[:n]
    for t in range(1, len(plane_streams)):
        b = bounds[t - 1]
        out = jnp.where(
            idx < b, out, jnp.roll(plane_streams[t].reshape(-1)[:n], b)
        )
    return out


def plane_parts(streams, p: int):
    """The per-stream buffers of plane p: pairs with `combine_parts`."""
    return tuple(s[p] for s in streams)


@functools.partial(jax.jit, static_argnames=("n", "out_dtype"))
def _combine_streams(plane_streams, bounds, n, out_dtype):
    out = combine_parts(plane_streams, bounds, n)
    if out.dtype != jnp.dtype(out_dtype):
        out = lax.bitcast_convert_type(out, jnp.dtype(out_dtype))
    return out


def radix_sort_chain(planes, bits, n: int, interpret: bool | None = None):
    """`radix_sort_chain_parts` + the flat combine: returns sorted (n,)
    planes with input dtypes (plane 0 still encoded)."""
    planes = tuple(planes)
    dtypes = [p.dtype for p in planes]
    streams, bounds = radix_sort_chain_parts(planes, bits, n, interpret)
    return tuple(
        _combine_streams(plane_parts(streams, p), bounds, n, jnp.dtype(d))
        for p, d in enumerate(dtypes)
    )


@jax.jit
def significant_bits_mask(key_u32):
    """OR ^ AND over the (bit-sortable-encoded) keys: a bit participates in
    ordering iff the keys differ on it — the radix chain skips the rest."""
    u = key_u32.astype(jnp.uint32)
    orv = lax.reduce(u, jnp.uint32(0), lax.bitwise_or, (0,))
    andv = lax.reduce(u, jnp.uint32(0xFFFFFFFF), lax.bitwise_and, (0,))
    return orv ^ andv
