"""Pallas streaming pairwise-merge kernel — the sort substrate (v2).

Full sorts run as: ONE batched XLA sort producing 8192-element runs (the
batched network is ~4.5x cheaper per element than XLA's flat full-length
sort: 130 ms vs 589 ms at 134M, tools/probe_r4.py), then log2(n/8192) passes
of this kernel, each merging adjacent run pairs in a single HBM round trip.
Measured throughput lives in BENCH_DETAILS.json (`sort_u32_kv`); design
rationale in docs/sort_design_notes.md.

The run length is a RUNTIME SCALAR, so one compiled kernel serves every pass
of a given n (the remote Mosaic compiler costs 200-800 s per compile).

v2 changes over the round-3 kernel (its measured diagnosis: 91.6 ms/pass,
DMA-LATENCY-bound at 2.8 us/step because every deque refill started a DMA
and immediately waited on it):

1. **Prefetch-ahead circular deques.**  Each stream's deque holds NSLOT=4
   tiles in a circular VMEM buffer; tile k DMAs into slot k%NSLOT as soon as
   the slot frees (tile k-NSLOT fully consumed), and the step loop only
   WAITS when its window first enters a tile — by which point that DMA has
   had >= (NSLOT-2) tiles' worth of step compute to complete.
2. **taa XOR-partner lane stages.**  Bitonic-clean stages with d < 128 pair
   element i with lane i^d via ONE static `take_along_axis` gather per plane
   instead of a 4-op roll-left + 4-op roll-right pair; measured 2.1x cheaper
   per step (probe_r4 mb_step_taa 0.99 us vs mb_step_rollpair 1.85 us).
3. **2-plane unique-payload mode.**  When the single payload plane is
   strictly ordering (argsort's row-index plane; any position-derived
   payload), the comparator is lexicographic (key, payload) and the
   synthetic window-position tiebreak plane is dropped: 2 planes through the
   network instead of 3.  Output equals the stable sort's (the payload IS
   the stability witness).  Stage-1 must then sort with num_keys=2.

Per merge step (T = 4096 elements):
  1. extract each stream's next-T window from its circular deque (dynamic
     flat roll by the head offset);
  2. Batcher half-cleaner against the REVERSED B window: the elementwise
     winners min(A[i], B[T-1-i]) are exactly the lowest T of the union, and
     they form a BITONIC sequence (classic bitonic-merge first stage);
  3. one log2(T)-stage bitonic merge network sorts the winner tile; a
     window-position tiebreak plane keeps the merge STABLE (A-parts before
     B-parts for equal keys, stream order within each part) — or, in
     unique-payload mode, the payload plane is the tiebreak;
  4. consumed counts (popcount of the winner mask) advance each deque.

Exhausted streams leave stale data in their deque slots; the comparator
masks positions beyond the stream's remaining count, so stale values are
never selected while output remains (remA+remB >= T until the pair's last
tile), real INT32_MAX keys order correctly, and exact output lengths
guarantee nothing stale is emitted.  Keys must be pre-transformed to
sortable int32 (wrapper below); any number of 32-bit payload planes ride
the network.

≙ reference seed: the multi-pass reduction relaunch loop
`/root/reference/crates/arithmetic/src/aggregate_kernels.rs:24-52`; the
reference has no sort — this is the north-star radix/merge sort operator
(BASELINE.md).  A radix scatter is not expressible on this hardware (no
vector scatter; DMA runs would be sub-tile), so the comparison-merge
formulation is the TPU-native choice — see docs/sort_design_notes.md.
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

from .compaction import _flat_roll_left, _flat_roll_right
from .kutils import taa_lanes

LANES = 128
T = 4096  # elements per merge step
TR = T // LANES  # 32 rows
NSLOT = 4  # circular deque depth (window spans <= 2 tiles; 2 prefetch-ahead)
CAPR = NSLOT * TR  # deque rows
SENT = 0x7FFFFFFF  # python int: jnp constants captured by kernels are rejected


def _flat_roll_left_dyn(x, h):
    """y[flat] = x[flat + h] for traced h (wraps)."""
    rows = x.shape[0]
    k = lax.div(h, jnp.int32(LANES))
    r = lax.rem(h, jnp.int32(LANES))
    lr = pltpu.roll(x, jnp.int32(LANES) - r, 1)
    nx = pltpu.roll(lr, jnp.int32(rows - 1) - k, 0)
    same = pltpu.roll(lr, lax.rem(jnp.int32(rows) - k, jnp.int32(rows)), 0)
    c = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(c < jnp.int32(LANES) - r, same, nx)


def _reverse_tile(x):
    """Full (TR, LANES) reversal: rev[i] = x[T-1-i] (flat order)."""
    ii = lax.broadcasted_iota
    xt = x.T  # rows -> lanes
    xt_rev = taa_lanes(xt, jnp.int32(TR - 1) - ii(jnp.int32, (LANES, TR), 1))
    xr = xt_rev.T
    return taa_lanes(xr, jnp.int32(LANES - 1) - ii(jnp.int32, (TR, LANES), 1))


def _make_kernel(n: int, nplanes: int, unique_payload: bool):
    """nplanes includes the key plane.  unique_payload=True requires
    nplanes == 2 with a strictly-ordering payload (see module docstring)."""
    assert not unique_payload or nplanes == 2

    def kernel(scal_ref, *refs):
        # refs: ins[nplanes] (HBM), outs[nplanes] (HBM),
        #       bufA[nplanes] (CAPR,128), bufB[nplanes], ostage[nplanes]
        #       (2,TR,128), sem_a(NSLOT,), sem_b(NSLOT,), sem_o(2,)
        L = scal_ref[0]
        ins = refs[:nplanes]
        outs = refs[nplanes : 2 * nplanes]
        bufA = refs[2 * nplanes : 3 * nplanes]
        bufB = refs[3 * nplanes : 4 * nplanes]
        ostage = refs[4 * nplanes : 5 * nplanes]
        sem_a, sem_b, sem_o = refs[5 * nplanes :]

        ii = lax.broadcasted_iota
        iota_flat = ii(jnp.int32, (TR, LANES), 0) * LANES + ii(
            jnp.int32, (TR, LANES), 1
        )
        lane_i = ii(jnp.int32, (TR, LANES), 1)
        n_pairs = lax.div(jnp.int32(n) + 2 * L - 1, 2 * L)

        def fetch_copies(bufs, sem, start, tile):
            slot = lax.rem(tile, jnp.int32(NSLOT))
            row0 = lax.div(start, jnp.int32(LANES)) + tile * jnp.int32(TR)
            return [
                pltpu.make_async_copy(
                    ins[p].at[pl.ds(row0, TR), :],
                    bufs[p].at[pl.ds(slot * jnp.int32(TR), TR)],
                    sem.at[slot],
                )
                for p in range(nplanes)
            ]

        def start_tile(bufs, sem, start, tile):
            for c in fetch_copies(bufs, sem, start, tile):
                c.start()

        def wait_tile(bufs, sem, start, tile):
            for c in fetch_copies(bufs, sem, start, tile):
                c.wait()

        def pair_body(pi, carry):
            startA = pi * 2 * L
            lenA = jnp.minimum(L, jnp.int32(n) - startA)
            startB = startA + L
            # typed operands only: weak literals recurse in convert lowering
            lenB = jnp.minimum(jnp.maximum(jnp.int32(n) - startB, jnp.int32(0)), L)
            out_row0 = lax.div(startA, jnp.int32(LANES))
            out_tiles = lax.div(lenA + lenB, jnp.int32(T))
            fmaxA = lax.div(lenA + jnp.int32(T - 1), jnp.int32(T))
            fmaxB = lax.div(lenB + jnp.int32(T - 1), jnp.int32(T))

            # prefill: start the first NSLOT tiles of each stream
            for tile in range(NSLOT):
                @pl.when(jnp.int32(tile) < fmaxA)
                def _():
                    start_tile(bufA, sem_a, startA, jnp.int32(tile))

                @pl.when(jnp.int32(tile) < fmaxB)
                def _():
                    start_tile(bufB, sem_b, startB, jnp.int32(tile))

            def step(j, st):
                hA, hB, consA, consB, nwA, nwB, nfA, nfB = st

                # wait for any tile the windows are entering (at most one new
                # tile per stream per step: cons advances <= T)
                twA = lax.div(consA + jnp.int32(T - 1), jnp.int32(T))
                @pl.when(jnp.logical_and(nwA <= twA, nwA < fmaxA))
                def _():
                    wait_tile(bufA, sem_a, startA, nwA)

                nwA = jnp.where(jnp.logical_and(nwA <= twA, nwA < fmaxA), nwA + 1, nwA)
                twB = lax.div(consB + jnp.int32(T - 1), jnp.int32(T))
                @pl.when(jnp.logical_and(nwB <= twB, nwB < fmaxB))
                def _():
                    wait_tile(bufB, sem_b, startB, nwB)

                nwB = jnp.where(jnp.logical_and(nwB <= twB, nwB < fmaxB), nwB + 1, nwB)

                winA = [
                    _flat_roll_left_dyn(bufA[p][...], hA)[:TR, :]
                    for p in range(nplanes)
                ]
                winB = [
                    _flat_roll_left_dyn(bufB[p][...], hB)[:TR, :]
                    for p in range(nplanes)
                ]
                revB = [_reverse_tile(w) for w in winB]

                remA = lenA - consA
                remB = lenB - consB
                sA = iota_flat >= remA
                sBrev = iota_flat < jnp.int32(T) - remB
                kA, kBrev = winA[0], revB[0]
                if unique_payload:
                    a_le_b = jnp.logical_or(
                        kA < kBrev,
                        jnp.logical_and(kA == kBrev, winA[1] <= revB[1]),
                    )
                else:
                    a_le_b = kA <= kBrev
                lessA = jnp.logical_and(
                    jnp.logical_not(sA), jnp.logical_or(sBrev, a_le_b)
                )
                # typed f32 planes: weak 1.0/0.0 literals become f64 vectors
                # under x64, which Mosaic's layout checker aborts on
                cA = jnp.sum(
                    jnp.where(
                        lessA,
                        jnp.ones((TR, LANES), jnp.float32),
                        jnp.zeros((TR, LANES), jnp.float32),
                    )
                ).astype(jnp.int32)

                low = [jnp.where(lessA, a, b) for a, b in zip(winA, revB)]

                # network planes: [key, tiebreak, payloads...] where the
                # tiebreak is either the unique payload itself or the
                # synthetic window position
                if unique_payload:
                    k_, t = low[0], low[1]
                    planes = []
                else:
                    k_ = low[0]
                    t = jnp.where(
                        lessA, iota_flat, jnp.int32(2 * T - 1) - iota_flat
                    )
                    planes = low[1:]

                one32 = jnp.ones((TR, LANES), jnp.int32)
                zero32 = jnp.zeros((TR, LANES), jnp.int32)
                for s in range(T.bit_length() - 2, -1, -1):
                    d = 1 << s
                    posbit = (iota_flat & d) != 0  # static plane
                    if d < LANES:
                        # XOR-partner lane gather: 1 op/plane vs 8-op rolls
                        idx = lane_i ^ d
                        pk = taa_lanes(k_, idx)
                        pt = taa_lanes(t, idx)
                        cond = jnp.logical_or(
                            k_ < pk, jnp.logical_and(k_ == pk, t < pt)
                        )
                        # keep self iff (self is min) == (position wants min)
                        keep_self = jnp.logical_xor(cond, posbit)
                        k_ = jnp.where(keep_self, k_, pk)
                        t = jnp.where(keep_self, t, pt)
                        planes = [
                            jnp.where(keep_self, x, taa_lanes(x, idx))
                            for x in planes
                        ]
                    else:
                        Lk = _flat_roll_left(k_, d)
                        Lt = _flat_roll_left(t, d)
                        # keep as i32: rolling i1 vectors crashes Mosaic layout
                        keep32 = jnp.where(
                            jnp.logical_or(
                                k_ < Lk, jnp.logical_and(k_ == Lk, t <= Lt)
                            ),
                            one32,
                            zero32,
                        )
                        takeSelf = (
                            jnp.where(posbit, _flat_roll_right(keep32, d), keep32)
                            == 1
                        )

                        def ce(x, Lx):
                            other = jnp.where(posbit, _flat_roll_right(x, d), Lx)
                            return jnp.where(takeSelf, x, other)

                        new_k = ce(k_, Lk)
                        new_t = ce(t, Lt)
                        planes = [ce(x, _flat_roll_left(x, d)) for x in planes]
                        k_, t = new_k, new_t

                slot = lax.rem(j, jnp.int32(2))
                if unique_payload:
                    res = [k_, t]
                else:
                    res = [k_] + planes

                @pl.when(j >= 2)
                def _():
                    for p in range(nplanes):
                        pltpu.make_async_copy(
                            ostage[p].at[slot],
                            outs[p].at[pl.ds(out_row0 + (j - 2) * TR, TR), :],
                            sem_o.at[slot],
                        ).wait()

                for p in range(nplanes):
                    ostage[p][slot] = res[p]
                    pltpu.make_async_copy(
                        ostage[p].at[slot],
                        outs[p].at[pl.ds(out_row0 + j * TR, TR), :],
                        sem_o.at[slot],
                    ).start()

                cB = jnp.int32(T) - cA
                consA = consA + cA
                consB = consB + cB
                hA = lax.rem(hA + cA, jnp.int32(NSLOT * T))
                hB = lax.rem(hB + cB, jnp.int32(NSLOT * T))

                # refill-start: tile nf's slot frees once nf-NSLOT tiles are
                # fully consumed (at most one per stream per step)
                canA = jnp.logical_and(
                    nfA < fmaxA, nfA < lax.div(consA, jnp.int32(T)) + jnp.int32(NSLOT)
                )
                @pl.when(canA)
                def _():
                    start_tile(bufA, sem_a, startA, nfA)

                nfA = jnp.where(canA, nfA + 1, nfA)
                canB = jnp.logical_and(
                    nfB < fmaxB, nfB < lax.div(consB, jnp.int32(T)) + jnp.int32(NSLOT)
                )
                @pl.when(canB)
                def _():
                    start_tile(bufB, sem_b, startB, nfB)

                nfB = jnp.where(canB, nfB + 1, nfB)
                return hA, hB, consA, consB, nwA, nwB, nfA, nfB

            st0 = (
                jnp.int32(0),
                jnp.int32(0),
                jnp.int32(0),
                jnp.int32(0),
                jnp.int32(0),
                jnp.int32(0),
                jnp.minimum(jnp.int32(NSLOT), fmaxA),
                jnp.minimum(jnp.int32(NSLOT), fmaxB),
            )
            st = lax.fori_loop(jnp.int32(0), out_tiles, step, st0)

            # drain the last two output tiles
            def drain(j, dc):
                slot = lax.rem(j, jnp.int32(2))

                @pl.when(j >= 2)
                def _():
                    for p in range(nplanes):
                        pltpu.make_async_copy(
                            ostage[p].at[slot],
                            outs[p].at[pl.ds(out_row0 + (j - 2) * TR, TR), :],
                            sem_o.at[slot],
                        ).wait()

                return dc

            lax.fori_loop(out_tiles, out_tiles + 2, drain, jnp.int32(0))
            return carry

        lax.fori_loop(jnp.int32(0), n_pairs, pair_body, jnp.int32(0))

    return kernel


@functools.partial(
    jax.jit, static_argnames=("unique_payload", "interpret")
)
def merge_pass_pallas(
    planes, run_len, unique_payload: bool = False, interpret: bool | None = None
):
    """One pairwise merge pass: sorted runs of `run_len` -> runs of 2*run_len.

    planes: tuple of (n,) int32 arrays — plane 0 is the sortable key, the
    rest are payloads; n % 8192 == 0; run_len a multiple of 8192 (traced
    scalar OK).  Stable.  unique_payload=True (exactly one payload plane
    that strictly orders equal keys, e.g. argsort's row indices): the
    payload is the comparator tiebreak and runs must be sorted by
    (key, payload).  Returns the merged planes.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    planes = tuple(planes)
    nplanes = len(planes)
    if unique_payload and nplanes != 2:
        raise ValueError("unique_payload mode requires exactly key + payload")
    n = planes[0].shape[0]
    assert n % 8192 == 0
    kernel = _make_kernel(n, nplanes, unique_payload)

    scratch = (
        [pltpu.VMEM((CAPR, LANES), jnp.int32) for _ in range(2 * nplanes)]
        + [pltpu.VMEM((2, TR, LANES), jnp.int32) for _ in range(nplanes)]
        + [
            pltpu.SemaphoreType.DMA((NSLOT,)),
            pltpu.SemaphoreType.DMA((NSLOT,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    )
    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * nplanes,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nplanes,
        scratch_shapes=scratch,
        out_shape=[
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32)
            for _ in range(nplanes)
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.full((1,), run_len, jnp.int32).astype(jnp.int32),
        *[p.reshape(-1, LANES) for p in planes],
    )
    return tuple(o.reshape(-1) for o in outs)


def to_sortable_i32(x):
    """Order-preserving bijection into int32 (ascending)."""
    if x.dtype == jnp.int32:
        return x
    if x.dtype == jnp.uint32:
        return lax.bitcast_convert_type(x ^ jnp.uint32(0x80000000), jnp.int32)
    if x.dtype == jnp.float32:
        # involution: positives are already ordered as i32; negatives flip
        # their magnitude bits so more-negative floats become more-negative
        # ints (-NaN orders first, +NaN last — lax.sort's total order)
        i = lax.bitcast_convert_type(x, jnp.int32)
        return jnp.where(i < 0, i ^ jnp.int32(0x7FFFFFFF), i)
    raise TypeError(f"no sortable transform for {x.dtype}")


def from_sortable_i32(k, dtype):
    if dtype == jnp.int32:
        return k
    if dtype == jnp.uint32:
        u = lax.bitcast_convert_type(k, jnp.uint32)
        return u ^ jnp.uint32(0x80000000)
    if dtype == jnp.float32:
        i = jnp.where(k < 0, k ^ jnp.int32(0x7FFFFFFF), k)  # involution
        return lax.bitcast_convert_type(i, jnp.float32)
    raise TypeError(f"no sortable transform for {dtype}")


@functools.partial(
    jax.jit, static_argnames=("length", "unique_payload", "interpret")
)
def sort_kv_pallas(
    keys,
    payloads=(),
    length=None,
    unique_payload: bool = False,
    interpret: bool | None = None,
):
    """Full stable key sort with payload planes: batched stage-1 + merge passes.

    keys: (n,) u32/i32/f32, n % 8192 == 0; payloads: tuple of (n,) 32-bit
    planes; rows >= `length` sort to the end (treated as +inf keys).
    unique_payload: exactly one payload plane whose values strictly order
    equal keys (argsort row indices, position-derived ranks) — drops the
    synthetic tiebreak plane from the merge network (2 planes instead of 3).
    Unique-mode requirements: payloads compare as SIGNED i32 bit patterns
    (use non-negative values), and when `length` masks padded rows their
    payloads must exceed every live payload (row indices satisfy both) —
    otherwise a padded row could tie-break ahead of a live INT32_MAX key.
    """
    n = keys.shape[0]
    assert n % 8192 == 0
    if unique_payload and len(payloads) != 1:
        raise ValueError("unique_payload mode requires exactly one payload")
    k = to_sortable_i32(keys)
    if length is not None and length < n:
        idx = lax.broadcasted_iota(jnp.int32, (n,), 0)
        k = jnp.where(idx < length, k, SENT)
    pl_ = [lax.bitcast_convert_type(p, jnp.int32) if p.dtype != jnp.int32 else p
           for p in payloads]
    R0 = 8192
    ops = lax.sort(
        [k.reshape(-1, R0)] + [p.reshape(-1, R0) for p in pl_],
        dimension=1,
        num_keys=2 if unique_payload else 1,
        is_stable=True,
    )
    planes = tuple(o.reshape(-1) for o in ops)
    L = R0
    while L < n:
        planes = merge_pass_pallas(
            planes, L, unique_payload=unique_payload, interpret=interpret
        )
        L *= 2
    out_k = from_sortable_i32(planes[0], keys.dtype)
    out_ps = tuple(
        lax.bitcast_convert_type(o, p.dtype) if p.dtype != jnp.int32 else o
        for o, p in zip(planes[1:], payloads)
    )
    return out_k, out_ps
