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
3. The pass count is a HOST loop of identical async dispatches — the bit
   and c0 are device scalars, so ONE compiled program serves every pass of
   every bit width (and the known remote-toolchain SIGSEGV on large fused
   multi-kernel programs is structurally avoided).

The per-block move is the proven v4 two-level compaction (searchsorted lane
gather + row-granular hole-filling network) run once per output stream —
see `compaction3.py` for the correctness argument.
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


@functools.partial(jax.jit, static_argnames=("n", "out_dtype"))
def _combine(planeS, planeU, c0, n, out_dtype):
    """concat(S[:c0], U[:n-c0]) as a flat (n,) array (no zero-tail needed:
    positions >= c0 select from the rolled U side)."""
    s = planeS.reshape(-1)[:n]
    u = planeU.reshape(-1)[:n]
    idx = lax.broadcasted_iota(jnp.int32, (n,), 0)
    out = jnp.where(idx < c0, s, jnp.roll(u, c0))
    if out_dtype != jnp.int32:
        out = lax.bitcast_convert_type(out, jnp.dtype(out_dtype))
    return out


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


def radix_sort_chain_parts(planes, bits, n: int, interpret: bool | None = None):
    """Stable LSB radix sort of flat 32-bit planes by plane 0's bits,
    returning the RAW chain state (S_planes, U_planes, c0): the sorted order
    is concat(S[:c0], U[:n-c0]) per plane.  Callers fuse their own decode /
    masking into the combine so the chain epilogue is ONE pass, not two.

    planes: tuple of (n,) 32-bit arrays (plane 0 = the key in an unsigned
    bit-sortable encoding); bits: iterable of bit positions, LSB-first;
    n % 8192 == 0.  Runs len(bits) identical async dispatches of ONE
    compiled pass program.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    planes = tuple(planes)
    rows = cap_rows_for(n)
    S = tuple(_to_cap(p, rows) for p in planes)
    U = S
    c0 = jnp.int32(n)
    bits = [int(b) for b in bits]
    first = True
    i = 0
    chunk = max(CHUNK, 1)
    while i < len(bits):
        group = bits[i : i + (1 if first else chunk)]
        i += len(group)
        if len(group) == 1:
            # also the mandatory first step: S and U alias one buffer there,
            # which the donating multipass call must never see
            S, U, c0 = _radix_pass_call(
                S, U, c0, jnp.int32(group[0]), n=n, interpret=interpret
            )
        else:
            S, U, c0 = _radix_multipass_call(
                S, U, c0, jnp.asarray(group, jnp.int32), n, len(group),
                interpret,
            )
        first = False
    return S, U, c0


def combine_parts(s, u, c0, n: int):
    """concat(S[:c0], U[:n-c0]) for one cap-shaped plane pair, traceable
    (use inside a fused epilogue program)."""
    sf = s.reshape(-1)[:n]
    uf = u.reshape(-1)[:n]
    idx = lax.broadcasted_iota(jnp.int32, (n,), 0)
    return jnp.where(idx < c0, sf, jnp.roll(uf, c0))


def radix_sort_chain(planes, bits, n: int, interpret: bool | None = None):
    """`radix_sort_chain_parts` + the flat combine: returns sorted (n,)
    planes with input dtypes (plane 0 still encoded)."""
    planes = tuple(planes)
    dtypes = [p.dtype for p in planes]
    S, U, c0 = radix_sort_chain_parts(planes, bits, n, interpret)
    return tuple(
        _combine(s, u, c0, n, jnp.dtype(d)) for s, u, d in zip(S, U, dtypes)
    )


@jax.jit
def significant_bits_mask(key_u32):
    """OR ^ AND over the (bit-sortable-encoded) keys: a bit participates in
    ordering iff the keys differ on it — the radix chain skips the rest."""
    u = key_u32.astype(jnp.uint32)
    orv = lax.reduce(u, jnp.uint32(0), lax.bitwise_or, (0,))
    andv = lax.reduce(u, jnp.uint32(0xFFFFFFFF), lax.bitwise_and, (0,))
    return orv ^ andv
