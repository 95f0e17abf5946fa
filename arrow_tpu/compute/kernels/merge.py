"""Pallas streaming pairwise-merge kernel — the sort substrate.

Full sorts run as: ONE batched XLA sort producing 8192-element runs (the
batched network is ~4x cheaper per element than XLA's flat full-length sort),
then log2(n/8192) passes of this kernel, each merging adjacent run pairs in a
single HBM round trip.  Measured throughput lives in BENCH_DETAILS.json
(`sort_u32_kv`); design rationale in docs/sort_design_notes.md.

The run length is a RUNTIME SCALAR, so one compiled kernel serves every pass
of a given n (the remote Mosaic compiler costs 20-40s per compile).

Per merge step (T = 4096 elements):
  1. extract each stream's next-T window from its VMEM deque (dynamic flat
     roll by the head offset);
  2. Batcher half-cleaner against the REVERSED B window: the elementwise
     winners min(A[i], B[T-1-i]) are exactly the lowest T of the union, and
     they form a BITONIC sequence (classic bitonic-merge first stage);
  3. one log2(T)-stage bitonic merge network sorts the winner tile; a
     window-position tiebreak plane keeps the merge STABLE (A-parts before
     B-parts for equal keys, stream order within each part);
  4. consumed counts (popcount of the winner mask) advance each deque; a
     deque refills one T-tile at a time, so every DMA has a static buffer
     destination and a tile-aligned HBM source.

Exhausted streams refill with INT32_MAX sentinels; the comparator masks
positions beyond the stream's remaining count, so real INT32_MAX keys still
order correctly, and exact output lengths guarantee sentinels are never
emitted.  Keys must be pre-transformed to sortable int32 (wrapper below);
any number of 32-bit payload planes ride the network.

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
CAPR = 2 * TR  # deque capacity: 64 rows
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


def _make_kernel(n: int, nplanes: int):
    nrows_in = n // LANES

    def kernel(scal_ref, *refs):
        # refs: ins[nplanes] (HBM), outs[nplanes] (HBM),
        #       bufA[nplanes] (CAPR,128), bufB[nplanes], ostage[nplanes] (2,TR,128),
        #       sem_a, sem_b, sem_o(2,)
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
        n_pairs = lax.div(jnp.int32(n) + 2 * L - 1, 2 * L)

        def fetch(bufs, sem, src_off, have):
            """DMA one tile into deque rows [TR:CAPR] or sentinel-fill."""

            @pl.when(have)
            def _():
                row0 = lax.div(src_off, jnp.int32(LANES))
                for p in range(nplanes):
                    pltpu.make_async_copy(
                        ins[p].at[pl.ds(row0, TR), :],
                        bufs[p].at[pl.ds(TR, TR)],
                        sem,
                    ).start()
                for p in range(nplanes):
                    pltpu.make_async_copy(
                        ins[p].at[pl.ds(row0, TR), :],
                        bufs[p].at[pl.ds(TR, TR)],
                        sem,
                    ).wait()

            @pl.when(jnp.logical_not(have))
            def _():
                for p in range(nplanes):
                    bufs[p][pl.ds(TR, TR), :] = jnp.full(
                        (TR, LANES), SENT, jnp.int32
                    )

        def shift_refill(bufs, sem, start, fetched, len_s):
            """Deque rows [0:TR] <- [TR:CAPR]; fetch next tile into [TR:CAPR]."""
            for p in range(nplanes):
                bufs[p][pl.ds(0, TR), :] = bufs[p][pl.ds(TR, TR), :]
            fetch(bufs, sem, start + fetched, fetched < len_s)

        def pair_body(pi, carry):
            startA = pi * 2 * L
            lenA = jnp.minimum(L, jnp.int32(n) - startA)
            startB = startA + L
            # typed operands only: weak literals recurse in convert lowering
            lenB = jnp.minimum(jnp.maximum(jnp.int32(n) - startB, jnp.int32(0)), L)
            out_row0 = lax.div(startA, jnp.int32(LANES))
            out_tiles = lax.div(lenA + lenB, jnp.int32(T))

            # prefill both deques (two tiles each)
            for p in range(nplanes):
                bufA[p][pl.ds(0, TR), :] = jnp.full((TR, LANES), SENT, jnp.int32)
                bufB[p][pl.ds(0, TR), :] = jnp.full((TR, LANES), SENT, jnp.int32)
            fetch(bufA, sem_a, startA, lenA > 0)
            for p in range(nplanes):
                bufA[p][pl.ds(0, TR), :] = bufA[p][pl.ds(TR, TR), :]
            fetch(bufA, sem_a, startA + T, lenA > T)
            fetch(bufB, sem_b, startB, lenB > 0)
            for p in range(nplanes):
                bufB[p][pl.ds(0, TR), :] = bufB[p][pl.ds(TR, TR), :]
            fetch(bufB, sem_b, startB + T, lenB > T)

            def step(j, st):
                hA, hB, remA, remB, fA, fB = st
                winA = [
                    _flat_roll_left_dyn(bufA[p][...], hA)[:TR, :]
                    for p in range(nplanes)
                ]
                winB = [
                    _flat_roll_left_dyn(bufB[p][...], hB)[:TR, :]
                    for p in range(nplanes)
                ]
                revB = [_reverse_tile(w) for w in winB]

                sA = iota_flat >= remA
                sBrev = iota_flat < jnp.int32(T) - remB
                kA, kBrev = winA[0], revB[0]
                lessA = jnp.logical_and(
                    jnp.logical_not(sA), jnp.logical_or(sBrev, kA <= kBrev)
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

                low = [
                    jnp.where(lessA, a, b) for a, b in zip(winA, revB)
                ]
                t = jnp.where(lessA, iota_flat, jnp.int32(2 * T - 1) - iota_flat)

                # bitonic merge network: the winner tile is bitonic
                k_, planes = low[0], low[1:]
                one32 = jnp.ones((TR, LANES), jnp.int32)
                zero32 = jnp.zeros((TR, LANES), jnp.int32)
                for s in range(T.bit_length() - 2, -1, -1):
                    d = 1 << s
                    posbit = (iota_flat & d) != 0  # static plane
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
                res = [k_] + planes

                @pl.when(j >= 2)
                def _():
                    for p in range(nplanes):
                        pltpu.make_async_copy(
                            ostage[p].at[slot],
                            outs[p].at[
                                pl.ds(out_row0 + (j - 2) * TR, TR), :
                            ],
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
                hA, remA = hA + cA, remA - cA
                hB, remB = hB + cB, remB - cB

                # shift + refill when a head crosses the first tile
                @pl.when(hA >= T)
                def _():
                    shift_refill(bufA, sem_a, startA, fA, lenA)

                @pl.when(hB >= T)
                def _():
                    shift_refill(bufB, sem_b, startB, fB, lenB)

                fA = jnp.where(hA >= T, fA + jnp.int32(T), fA)
                hA = jnp.where(hA >= T, hA - jnp.int32(T), hA)
                fB = jnp.where(hB >= T, fB + jnp.int32(T), fB)
                hB = jnp.where(hB >= T, hB - jnp.int32(T), hB)
                return hA, hB, remA, remB, fA, fB

            st0 = (
                jnp.int32(0),
                jnp.int32(0),
                lenA,
                lenB,
                jnp.int32(2 * T),
                jnp.int32(2 * T),
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


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_pass_pallas(planes, run_len, interpret: bool | None = None):
    """One pairwise merge pass: sorted runs of `run_len` -> runs of 2*run_len.

    planes: tuple of (n,) int32 arrays — plane 0 is the sortable key, the
    rest are payloads; n % 8192 == 0; run_len a multiple of 8192 (traced
    scalar OK).  Stable.  Returns the merged planes.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    planes = tuple(planes)
    nplanes = len(planes)
    n = planes[0].shape[0]
    assert n % 8192 == 0
    kernel = _make_kernel(n, nplanes)

    scratch = (
        [pltpu.VMEM((CAPR, LANES), jnp.int32) for _ in range(2 * nplanes)]
        + [pltpu.VMEM((2, TR, LANES), jnp.int32) for _ in range(nplanes)]
        + [
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
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


@functools.partial(jax.jit, static_argnames=("length", "interpret"))
def sort_kv_pallas(keys, payloads=(), length=None, interpret: bool | None = None):
    """Full stable key sort with payload planes: batched stage-1 + merge passes.

    keys: (n,) u32/i32/f32, n % 8192 == 0; payloads: tuple of (n,) 32-bit
    planes; rows >= `length` sort to the end (treated as +inf keys).
    """
    n = keys.shape[0]
    assert n % 8192 == 0
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
        num_keys=1,
        is_stable=True,
    )
    planes = tuple(o.reshape(-1) for o in ops)
    L = R0
    while L < n:
        planes = merge_pass_pallas(planes, L, interpret=interpret)
        L *= 2
    out_k = from_sortable_i32(planes[0], keys.dtype)
    out_ps = tuple(
        lax.bitcast_convert_type(o, p.dtype) if p.dtype != jnp.int32 else o
        for o, p in zip(planes[1:], payloads)
    )
    return out_k, out_ps
