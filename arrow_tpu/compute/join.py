"""Hash join: inner equi-join on integer keys, duplicates supported.

Net-new north-star operator (BASELINE.md: "distributed hash join: 1B x 1B
u64-key equi-join, hash-partitioned across N>=2 hosts, skewed keys").  This
module is the single-device operator; `arrow_tpu.parallel.distributed_ops`
hash-partitions both sides across the mesh and runs this per shard.

Design (TPU-native, sort-probe): instead of a pointer-chasing hash table (which
maps poorly to the VPU), per-probe match bounds come from ONE tag co-sort of
build+probe keys (`probe_bounds`), then an emit pass expands the ranges:

  sort concat(build, probe) by (key limbs..., is_build) — probe first on ties
  b4[c]       = #build rows before sorted position c (cumsum)
  lo (probe)  = b4[c]                     (ties place build rows after it)
  hi (probe)  = nb - (#build after own key segment)   (reverse propagation)
  match_count = hi - lo          (handles duplicate build keys)
  total       = sum(match_count)              -> host sync, output size
  out position  j emits probe row  i = searchsorted(offsets, j, 'right')-1
                 and build row  order[lo[i] + (j - offsets[i])]

64-bit keys are decomposed into 32-bit limb columns and sorted with
`num_keys=2` — TPU lanes are 32-bit and emulated u64 comparators are both ~2x
slower and crash some deployment toolchains (`utils.scans.sort_limbs`).

Two emit strategies:

- **merge-expand** (TPU default, round 4): the whole join materializes with
  ZERO random gathers.  XLA's gather at this scale is serialized
  (measured 982 ms for 67M u32 lookups, /root/scratch/join_probes.json —
  the round-3 emit path cost 10.9 s at the bench config because of three of
  them plus a method="sort" searchsorted).  Instead: ONE co-sort builds, in
  key order, the build-rank->row-id list (sorder) and the non-empty probe
  run list (end, probe_row, lo) via Pallas compactions; one Pallas MERGE
  pass of (run ends x output iota) run-length-DECODES every output's
  (probe_row, build rank) — packed-i64 cummax fills propagate the run
  payloads, so equal work rides 3 bandwidth-bound scans; a second merge
  pass against the rank-indexed sorder list resolves build ranks to row
  ids.  Output order is build-rank-major (join output order is
  implementation-defined; every test compares pair SETS).
- **legacy** (CPU / fallback): searchsorted-by-sort + XLA gathers — correct
  everywhere, quadratically slower at scale.

ARROW_TPU_JOIN_EMIT forces "merge" or "legacy" ("auto" default).

Null semantics: NULL keys never match (dropped from both sides).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.lax as lax
import jax.numpy as jnp

from .. import dtypes as dt
from ..array.array import ArrowArrayBase, make_array, pad_len
from ..errors import OperationNotSupported
from ..table import RecordBatch
from ..utils import bits as B


def _valid_mask(data, validity, length):
    n = data.shape[0]
    idx = lax.broadcasted_iota(jnp.int32, (n,), 0)
    in_range = idx < length
    if validity is None:
        return in_range
    return B.unpack_bits(validity) & in_range


def probe_bounds(bkeys, bvalid, pkeys, pvalid, ordered: bool = True):
    """Per-probe [lo, hi) match ranks among valid build rows.

    ONE multi-key sort of concat(build, probe) + one unsort replaces the two
    `searchsorted(..., method='sort')` co-sorts (4 internal sorts) of the
    naive formulation, and limb decomposition keeps 64-bit keys exact without
    emulated 64-bit comparators.

    ordered=False skips the unsort and returns bounds in co-sorted key order
    with probe rows marked by isb==0 — enough for count-only consumers.
    """
    from ..utils.scans import (
        merge_lex_sort, merge_sort_ok, prefix_sum, shift_cummax, sort_limbs,
    )

    n, m = bkeys.shape[0], pkeys.shape[0]
    keys = [
        jnp.concatenate([b, p])
        for b, p in zip(sort_limbs(bkeys), sort_limbs(pkeys))
    ]
    # invalid build rows tagged as non-build: they count toward no probe.
    # isb rides as payload, not key: lo/hi are derived from key-segment
    # boundaries, so tie order between build and probe rows is irrelevant.
    isb = jnp.concatenate(
        [bvalid.astype(jnp.int32), jnp.zeros((m,), jnp.int32)]
    )
    payload = [isb]
    if ordered:
        payload.append(lax.broadcasted_iota(jnp.uint32, (n + m,), 0))
    use_merge = merge_sort_ok(bkeys, pkeys) and (n + m) % 8192 == 0
    if use_merge:
        out = merge_lex_sort(keys, payload)
    else:
        out = lax.sort([*keys, *payload], num_keys=len(keys))
    skeys, sb = out[: len(keys)], out[len(keys)]
    b4 = (prefix_sum(sb) - sb).astype(jnp.int32)
    idx = lax.broadcasted_iota(jnp.int32, (n + m,), 0)
    start = idx == 0
    for sk in skeys:
        start = start | (sk != jnp.roll(sk, 1))
    # lo = #build rows in strictly-earlier key segments = b4 at segment start;
    # b4 is non-decreasing, so masked cummax propagates it across the segment
    lo_s = shift_cummax(jnp.where(start, b4, -1))
    nbv = jnp.sum(sb, dtype=jnp.int32)
    after = nbv - b4 - sb  # build rows strictly after c
    end = jnp.roll(start, -1).at[n + m - 1].set(True)
    hi_s = nbv - shift_cummax(jnp.where(end, after, -1), reverse=True)
    if not ordered:
        return jnp.where(sb == 0, lo_s, 0), jnp.where(sb == 0, hi_s, 0)
    sorig = out[len(keys) + 1]
    # restore original order: one single-key sort carrying both bounds
    if use_merge:
        _, lo_o, hi_o = merge_lex_sort([sorig], [lo_s, hi_s])
    else:
        _, lo_o, hi_o = lax.sort([sorig, lo_s, hi_s], num_keys=1)
    lo_p, hi_p = lo_o[n:], hi_o[n:]
    lo_p = jnp.where(pvalid, lo_p, 0)
    hi_p = jnp.where(pvalid, hi_p, 0)
    return lo_p, jnp.maximum(hi_p, lo_p)


def build_order(bkeys, bvalid, all_valid: bool = False, length: int | None = None):
    """Valid build rows' ids in key order (rank -> row id), invalid last.

    all_valid=True (no validity bitmap) drops the rank key so the sort can
    ride the Pallas merge kernel; `length` (static) pushes zero-padded buffer
    rows to the end there (the rank path handles them via bvalid)."""
    from ..utils.scans import merge_lex_sort, merge_sort_ok, sort_limbs

    rows = lax.broadcasted_iota(jnp.uint32, (bkeys.shape[0],), 0)
    limbs = sort_limbs(bkeys)
    if all_valid and merge_sort_ok(bkeys):
        return merge_lex_sort(limbs, [rows], length=length)[-1]
    rank = jnp.where(bvalid, 0, 1).astype(jnp.int32)
    out = lax.sort([rank, *limbs, rows], num_keys=1 + len(limbs), is_stable=True)
    return out[-1]


@functools.lru_cache(maxsize=None)
def _count_program(spec: tuple):
    (nb, lb, bv, np_, lp, pv) = spec

    def run(bkeys, bvalidity, pkeys, pvalidity):
        bvalid = _valid_mask(bkeys, bvalidity, lb)
        pvalid = _valid_mask(pkeys, pvalidity, lp)
        sorder = build_order(bkeys, bvalid, all_valid=not bv, length=lb)
        lo, hi = probe_bounds(bkeys, bvalid, pkeys, pvalid)
        cnt = (hi - lo).astype(jnp.int64)
        offsets = jnp.cumsum(cnt) - cnt
        total = jnp.sum(cnt)
        return total, cnt, offsets, lo, sorder

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _emit_program(out_cap: int):
    def run(cnt, offsets, lo, sorder, total):
        j = lax.broadcasted_iota(jnp.int64, (out_cap,), 0)
        # probe row for each output slot: last offset <= j
        pi = jnp.searchsorted(offsets + cnt, j, side="right", method="sort")
        pi = jnp.minimum(pi, offsets.shape[0] - 1)
        r = j - offsets[pi]
        bpos = lo[pi].astype(jnp.int64) + r
        bi = sorder[jnp.clip(bpos, 0, sorder.shape[0] - 1)]
        live = j < total
        probe_idx = jnp.where(live, pi, 0).astype(jnp.uint32)
        build_idx = jnp.where(live, bi, 0).astype(jnp.uint32)
        return probe_idx, build_idx

    return jax.jit(run)


def _bucket(n: int) -> int:
    """Round capacity up to limit emit-program recompiles."""
    n = max(n, 1)
    b = pad_len(n)
    p = 1024
    while p < b:
        p <<= 1
    return p


# ---------------------------------------------------------------------------
# merge-expand emit (gather-free, TPU fast path)
# ---------------------------------------------------------------------------

_SENT = 0x7FFFFFFF


def _fit(x, cap: int):
    """Static-shape pad/slice of a 1-D plane to `cap` (zero fill)."""
    n = x.shape[0]
    if n == cap:
        return x
    if n > cap:
        return x[:cap]
    return jnp.concatenate([x, jnp.zeros((cap - n,), x.dtype)])


def _compact_planes(planes, mask):
    """Compact i32 planes by a bool mask (front-packed, zero-padded tail).

    TPU: the Pallas block-compaction kernel; elsewhere the XLA
    stable-partition ladder.  Output planes are sliced back to input length.
    """
    n = planes[0].shape[0]
    if jax.default_backend() == "tpu" and n % 8192 == 0:
        from .kernels.compaction3 import compact_multi_pallas

        outs, _, _cnt = compact_multi_pallas(
            tuple(planes), (), B.pack_bits(mask)
        )
        return tuple(o[:n] for o in outs)
    from ..utils.scans import stable_partition

    outs = stable_partition(mask, list(planes))
    count = jnp.sum(mask, dtype=jnp.int32)
    live = lax.broadcasted_iota(jnp.int32, (n,), 0) < count
    return tuple(jnp.where(live, o, jnp.zeros_like(o)) for o in outs)


@functools.lru_cache(maxsize=None)
def _join_plan_prep(spec: tuple):
    """Build the co-sort operands: per-limb key planes (invalid rows forced
    to MAX so they group last) + the tagged row-id payload."""
    (nb, lb, bv, np_, lp, pv, narrow) = spec

    def run(bkeys, bvalidity, pkeys, pvalidity):
        from ..utils.scans import sort_limbs

        bvalid = _valid_mask(bkeys, bvalidity, lb)
        pvalid = _valid_mask(pkeys, pvalidity, lp)
        tot = nb + np_
        if narrow:
            # adaptive key narrowing: caller verified every key < 2^32 (and
            # non-negative), so the co-sort runs on ONE u32 limb.  Bitcast
            # limb extraction, NOT astype: a 64->32 convert at 67M measured
            # 171 ms of device time in the r5 plan-prep trace (20x roofline)
            bkeys = lax.bitcast_convert_type(bkeys, jnp.uint32)[:, 0]
            pkeys = lax.bitcast_convert_type(pkeys, jnp.uint32)[:, 0]
        keys = [
            jnp.concatenate([b, p])
            for b, p in zip(sort_limbs(bkeys), sort_limbs(pkeys))
        ]
        valid_all = jnp.concatenate([bvalid, pvalid])
        # invalid rows: MAX keys (sort last) + dead row-id marker
        keys = [
            jnp.where(valid_all, k, jnp.asarray(jnp.iinfo(k.dtype).max, k.dtype))
            for k in keys
        ]
        sorig = lax.broadcasted_iota(jnp.int32, (tot,), 0)
        sorig = jnp.where(valid_all, sorig, jnp.int32(tot))
        sig = None
        if len(keys) == 1:
            u = keys[0].astype(jnp.uint32)
            sig = lax.reduce(u, jnp.uint32(0), lax.bitwise_or, (0,)) ^ lax.reduce(
                u, jnp.uint32(0xFFFFFFFF), lax.bitwise_and, (0,)
            )
        return keys, sorig, sig

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _join_plan_sort(spec: tuple):
    def run(keys, sorig):
        # grouping order only: segment bounds come from key boundaries and
        # any within-key order yields the same pair SET
        out = lax.sort([*keys, sorig], num_keys=len(keys), is_stable=False)
        return out[:-1], out[-1]

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _join_plan_post(spec: tuple):
    """From the co-sorted (key planes, tagged row ids): the key-ordered build
    row-id list (sorder) and the non-empty probe run list (end, probe_row,
    lo)."""
    (nb, lb, bv, np_, lp, pv, narrow) = spec

    def run(skeys, so, bounds=None):
        from ..utils.scans import prefix_sum, shift_cummax

        tot = nb + np_
        if bounds is not None:
            # raw radix-chain parts: fuse the stream combine into this
            # program's first read (one sweep instead of combine + read)
            from .kernels.radix import combine_parts

            skeys = [combine_parts(st, bounds, tot) for st in skeys]
            so = combine_parts(so, bounds, tot)
        isb = (so < nb).astype(jnp.int32)
        isp = jnp.logical_and(so >= nb, so < tot)
        b4 = (prefix_sum(isb) - isb).astype(jnp.int32)
        idx = lax.broadcasted_iota(jnp.int32, (tot,), 0)
        start = idx == 0
        for sk in skeys:
            start = start | (sk != jnp.roll(sk, 1))
        lo_s = shift_cummax(jnp.where(start, b4, -1))
        nbv = jnp.sum(isb, dtype=jnp.int32)
        after = nbv - b4 - isb
        end = jnp.roll(start, -1).at[tot - 1].set(True)
        hi_s = nbv - shift_cummax(jnp.where(end, after, -1), reverse=True)
        cnt_s = jnp.where(isp, hi_s - lo_s, 0).astype(jnp.int32)
        total = jnp.sum(cnt_s, dtype=jnp.int64)
        # Pallas limb scan, not jnp.cumsum: the i64 cumsum lowers to a
        # 140 ms reduce-window at 134M (r5 device trace)
        from ..utils.scans import prefix_sum as _psum

        offs64 = _psum(cnt_s.astype(jnp.int64)) - cnt_s
        ends_s = (offs64 + cnt_s).astype(jnp.int32)  # fast path gated <2^31
        prow_s = so - jnp.int32(nb)
        (sorder,) = _compact_planes((so,), isb == 1)
        runs_mask = jnp.logical_and(isp, cnt_s > 0)
        ends_l, prow_l, lo_l = _compact_planes(
            (ends_s, prow_s, lo_s), runs_mask
        )
        m_eff = jnp.sum(runs_mask, dtype=jnp.int32)
        return total, m_eff, sorder, ends_l, prow_l, lo_l

    # the co-sort operands (radix stream parts or lax-sorted planes) are
    # intermediates the caller never reuses — donate them so the post
    # program's scans/compactions can reuse their HBM
    return jax.jit(run, donate_argnums=(0, 1))


def _join_plan(spec, bkeys, bvalidity, pkeys, pvalidity):
    """prep -> co-sort -> post.  The co-sort rides the Pallas radix chain
    when the key is a single u32 plane (native u32 or narrowed u64) on TPU —
    the plan sort was ~55% of the r4 join cost on the lax.sort bound
    (VERDICT r4 #2); only the SIGNIFICANT key bits are chained (the OR^AND
    mask costs one tiny host sync)."""
    (nb, lb, bv, np_, lp, pv, narrow) = spec
    tot = nb + np_
    keys, sorig, sig = _join_plan_prep(spec)(bkeys, bvalidity, pkeys, pvalidity)
    use_radix = (
        sig is not None
        and keys[0].dtype == jnp.uint32
        and tot % 8192 == 0
        and tot >= (1 << 26)  # below ~64M the fused lax.sort plan wins
        and jax.default_backend() == "tpu"
    )
    if use_radix:
        from .kernels.radix import plane_parts, radix_sort_chain_parts

        bits = [b for b in range(32) if (int(sig) >> b) & 1]
        streams, bounds = radix_sort_chain_parts((keys[0], sorig), bits, tot)
        return _join_plan_post(spec)(
            [plane_parts(streams, 0)], plane_parts(streams, 1), tuple(bounds)
        )
    skeys, so = _join_plan_sort(spec)(keys, sorig)
    return _join_plan_post(spec)(skeys, so)


@functools.lru_cache(maxsize=None)
def _expand_program(cap: int):
    """Run-length decode: output slot j -> (probe_row, build rank).

    One Pallas merge pass interleaves the (strictly increasing) run-end list
    with the output iota; packed (key<<32 | payload) i64 cummaxes propagate
    each run's (probe_row, lo) onto its outputs — monotone because the run
    ends are, so a plain cummax IS the segmented fill.

    Split into prep/merge/post dispatches: one fused program containing the
    merge kernel plus the scans plus the compaction kernel SIGSEGVs the
    remote Mosaic compile helper at caps >= 2^21 (each piece alone compiles
    fine — bisected on-chip, round 4)."""
    from .kernels.merge import merge_pass_pallas

    @jax.jit
    def prep(ends_l, prow_l, lo_l, m_eff):
        qi = lax.broadcasted_iota(jnp.int32, (cap,), 0)
        live_a = qi < m_eff
        ka = jnp.where(live_a, _fit(ends_l, cap), jnp.int32(_SENT))
        # A-row q owns outputs [end_q, end_{q+1}): carry the NEXT run's
        # (probe_row, lo); the first run's values come from scalars in post
        p1a = jnp.where(live_a, jnp.roll(_fit(prow_l, cap), -1), jnp.int32(0))
        p2a = jnp.where(live_a, jnp.roll(_fit(lo_l, cap), -1), jnp.int32(0))
        kb = qi
        p1b = jnp.full((cap,), -1, jnp.int32)
        p2b = jnp.zeros((cap,), jnp.int32)
        return (
            jnp.concatenate([ka, kb]),
            jnp.concatenate([p1a, p1b]),
            jnp.concatenate([p2a, p2b]),
        )

    @jax.jit
    def post(mk, m1, m2, prow_l, lo_l, total32):
        """Propagate each run's (end, prow, lo) onto its outputs, compute
        (probe_idx, bpos), compact the output rows.

        The fill is ONE 3-plane SEGMENTED max scan (Pallas streaming kernel)
        with the tagged rows as segment starts: every untagged plane value
        is -1, so the per-plane max within a segment IS the tag row's value.
        (lax.cummax on packed i64 lowered to reduce-windows that DOMINATED
        the join — 194 ms for one fill at 32M in the device trace — and two
        of them in one program SIGSEGV the remote compile helper.)"""
        tag = m1 >= 0
        kt = jnp.where(tag, mk, jnp.int32(-1))
        from .kernels.segscan import combine_max, scan_supported, segscan_pallas

        if scan_supported(kt, "max"):
            fk, f1, f2 = segscan_pallas((kt, m1, m2), tag, combine_max)
        else:
            # CPU/small fallback: packed-i64 cummax fills (run keys are
            # strictly increasing, so the packed value is monotone; the
            # plain per-plane ladder would NOT be — payloads are arbitrary)
            mk64 = mk.astype(jnp.int64)
            p1_ = lax.cummax(
                jnp.where(
                    tag, (mk64 << 32) | m1.astype(jnp.int64), jnp.int64(-1)
                )
            )
            p2_ = lax.cummax(
                jnp.where(
                    tag, (mk64 << 32) | m2.astype(jnp.int64), jnp.int64(-1)
                )
            )
            fk = (p1_ >> 32).astype(jnp.int32)
            f1 = jnp.where(
                p1_ >= 0,
                (p1_ & jnp.int64(0xFFFFFFFF)).astype(jnp.int32),
                jnp.int32(-1),
            )
            f2 = (p2_ & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)
        valid = f1 >= 0
        prow_j = jnp.where(valid, f1, prow_l[0])
        ep = jnp.where(valid, fk, jnp.int32(0))
        lo_j = jnp.where(valid, f2, lo_l[0])
        bpos = lo_j + (mk - ep)
        # dead outputs (j >= total) sort last in the rank-fill stage
        bpos = jnp.where(mk < total32, bpos, jnp.int32(_SENT - 1))
        pidx, bposc = _compact_planes((prow_j, bpos), jnp.logical_not(tag))
        return pidx[:cap], bposc[:cap]

    def run(ends_l, prow_l, lo_l, m_eff, total32):
        interp = jax.default_backend() != "tpu"
        k, p1, p2 = prep(ends_l, prow_l, lo_l, m_eff)
        mk, m1, m2 = merge_pass_pallas(
            (k, p1, p2), jnp.int32(cap), interpret=interp
        )
        return post(mk, m1, m2, prow_l, lo_l, total32)

    return run


@functools.lru_cache(maxsize=None)
def _rank_fill_program(cap: int, table_len: int):
    """Resolve build RANKS to build ROW IDS without a gather: sort the
    queries (the final output order becomes build-rank-major), merge them
    with the rank-indexed sorder list, cummax-fill, compact."""
    from .kernels.merge import merge_pass_pallas

    L = max(cap, table_len)

    @jax.jit
    def prep(bpos, pidx, sorder):
        sb_, sp_ = lax.sort([bpos, pidx], num_keys=1, is_stable=False)
        qi = lax.broadcasted_iota(jnp.int32, (L,), 0)
        ka = qi  # dense ranks: iota IS the table key
        va = _fit(sorder, L)
        ta = jnp.ones((L,), jnp.int32)
        kb = _fit(sb_, cap if cap >= L else L)
        if cap < L:
            kb = jnp.where(qi < cap, kb, jnp.int32(_SENT))
        vb = _fit(sp_, L)
        tb = jnp.zeros((L,), jnp.int32)
        return (
            jnp.concatenate([ka, kb]),
            jnp.concatenate([va, vb]),
            jnp.concatenate([ta, tb]),
        )

    @jax.jit
    def post(mk, mv, mt, total32):
        from .kernels.segscan import combine_max, scan_supported, segscan_pallas

        tag = mt == 1
        vt = jnp.where(tag, mv, jnp.int32(-1))
        if scan_supported(vt, "max"):
            # segmented max with table rows as segment starts: propagates
            # each rank's sorder value onto its queries (see _expand_program)
            (f,) = segscan_pallas((vt,), tag, combine_max)
            bidx = f
        else:
            mk64 = mk.astype(jnp.int64)
            f = lax.cummax(
                jnp.where(
                    tag, (mk64 << 32) | mv.astype(jnp.int64), jnp.int64(-1)
                )
            )
            bidx = (f & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)
        pid_o, bid_o = _compact_planes((mv, bidx), mt == 0)
        # zero-padding invariant: when the build table has no zero tail
        # (nbv == table_len) the compaction count covers every query row,
        # so dead slots [total, cap) would keep the rank-fill's last table
        # value (a REAL build row id) — mask both outputs explicitly
        live = lax.broadcasted_iota(jnp.int32, (cap,), 0) < total32
        pid_o = jnp.where(live, pid_o[:cap], jnp.int32(0))
        bid_o = jnp.where(live, bid_o[:cap], jnp.int32(0))
        return pid_o, bid_o

    def run(bpos, pidx, sorder, total32):
        interp = jax.default_backend() != "tpu"
        k, v, t = prep(bpos, pidx, sorder)
        mk, mv, mt = merge_pass_pallas((k, v, t), jnp.int32(L), interpret=interp)
        return post(mk, mv, mt, total32)

    return run


def join_indices(
    build_keys: ArrowArrayBase, probe_keys: ArrowArrayBase
) -> Tuple[ArrowArrayBase, ArrowArrayBase, int]:
    """Inner-join match pairs: (probe_indices, build_indices, count)."""
    for k in (build_keys, probe_keys):
        if not dt.is_integer(k.dtype):
            raise OperationNotSupported(f"join key dtype {k.dtype.value} unsupported")
    if build_keys.dtype is not probe_keys.dtype:
        raise OperationNotSupported("join key dtypes must match")
    if build_keys.length == 0 or probe_keys.length == 0:
        import jax.numpy as _jnp

        empty = _jnp.zeros((0,), _jnp.uint32)
        dev = probe_keys.device
        return (
            make_array(empty, None, 0, dt.ArrowType.UINT32, dev),
            make_array(empty, None, 0, dt.ArrowType.UINT32, dev),
            0,
        )
    import os

    spec = (
        int(build_keys.data.shape[0]), build_keys.length, build_keys.validity is not None,
        int(probe_keys.data.shape[0]), probe_keys.length, probe_keys.validity is not None,
    )
    dev = probe_keys.device
    mode = os.environ.get("ARROW_TPU_JOIN_EMIT", "auto")
    nb_pad, np_pad = spec[0], spec[3]
    # both pads individually: _rank_fill_program's merge pass needs its run
    # length L = max(cap, nb_pad) to be a multiple of 8192, which the summed
    # gate only guarantees at the default pad_unit (ADVICE r4)
    use_merge = mode == "merge" or (
        mode == "auto"
        and jax.default_backend() == "tpu"
        and nb_pad % 8192 == 0
        and np_pad % 8192 == 0
    )
    if use_merge:
        # adaptive key narrowing (a la DuckDB): 64-bit keys whose observed
        # range fits u32 co-sort on one limb (~25% cheaper plan sort); the
        # range check is two tiny reductions + one host sync, only worth it
        # at scale
        narrow = False
        if (
            dt.item_size(build_keys.dtype) == 8
            and nb_pad + np_pad >= (1 << 22)
        ):
            # the u64 view makes negatives huge, so signed keys with any
            # negative value never narrow; null/padded rows hold zeros
            mx = jnp.maximum(
                jnp.max(build_keys.data.astype(jnp.uint64)),
                jnp.max(probe_keys.data.astype(jnp.uint64)),
            )
            narrow = bool(mx < (1 << 32))
        total, m_eff, sorder, ends_l, prow_l, lo_l = _join_plan(
            spec + (narrow,),
            build_keys.data, build_keys.validity,
            probe_keys.data, probe_keys.validity,
        )
        t = int(total)
        if t == 0:
            empty = jnp.zeros((0,), jnp.uint32)
            return (
                make_array(empty, None, 0, dt.ArrowType.UINT32, dev),
                make_array(empty, None, 0, dt.ArrowType.UINT32, dev),
                0,
            )
        if t < (1 << 31):
            cap = max(_bucket(t), 8192)
            pidx, bpos = _expand_program(cap)(
                ends_l, prow_l, lo_l, m_eff, jnp.int32(t)
            )
            pidx, bidx = _rank_fill_program(cap, nb_pad)(
                bpos, pidx, sorder, jnp.int32(t)
            )
            return (
                make_array(
                    pidx.astype(jnp.uint32), None, t, dt.ArrowType.UINT32, dev
                ),
                make_array(
                    bidx.astype(jnp.uint32), None, t, dt.ArrowType.UINT32, dev
                ),
                t,
            )
        # t >= 2^31: fall through to the legacy i64 emit
    cp = _count_program(spec)
    total, cnt, offsets, lo, sorder = cp(
        build_keys.data, build_keys.validity, probe_keys.data, probe_keys.validity
    )
    t = int(total)
    cap = _bucket(t)
    ep = _emit_program(cap)
    probe_idx, build_idx = ep(cnt, offsets, lo, sorder, total)
    return (
        make_array(probe_idx, None, t, dt.ArrowType.UINT32, dev),
        make_array(build_idx, None, t, dt.ArrowType.UINT32, dev),
        t,
    )


def hash_join(
    left: RecordBatch,
    right: RecordBatch,
    left_on: str,
    right_on: str,
    suffixes: Tuple[str, str] = ("_l", "_r"),
) -> RecordBatch:
    """Inner equi-join of two RecordBatches; `right` is the build side."""
    probe_idx, build_idx, t = join_indices(right[right_on], left[left_on])
    from ..kernels import take as _take

    cols = {}
    for name, col in left.columns().items():
        clash = name in right.column_names and not (
            name == left_on and name == right_on
        )
        cols[name + suffixes[0] if clash else name] = _take(col, probe_idx)
    for name, col in right.columns().items():
        if name == right_on and left_on == right_on:
            continue  # key column already present from the left side
        out_name = name + suffixes[1] if name in left.column_names else name
        cols[out_name] = _take(col, build_idx)
    return RecordBatch(cols)
