"""Hash join: inner equi-join on integer keys, duplicates supported.

Net-new north-star operator (BASELINE.md: "distributed hash join: 1B x 1B
u64-key equi-join, hash-partitioned across N>=2 hosts, skewed keys").  This
module is the single-device operator; `arrow_tpu.parallel.distributed_ops`
hash-partitions both sides across the mesh and runs this per shard.

Design (TPU-native, sort-probe): instead of a pointer-chasing hash table (which
maps poorly to the VPU), the build side is sorted once and probes are binary
searches — `jnp.searchsorted` vectorizes over all probe rows at once:

  sb            = sort(build_keys)                       (XLA TPU sort)
  lo/hi         = searchsorted(sb, probe, 'left'/'right')
  match_count   = hi - lo          (handles duplicate build keys)
  total         = sum(match_count)              -> host sync, output size
  out position  j emits probe row  i = searchsorted(offsets, j, 'right')-1
                 and build row  order[lo[i] + (j - offsets[i])]

Two programs: a count pass (shape-stable) and an emit pass whose output
capacity is bucketed to limit recompiles across total sizes.

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


@functools.lru_cache(maxsize=None)
def _count_program(spec: tuple):
    (nb, lb, bv, np_, lp, pv) = spec

    def run(bkeys, bvalidity, pkeys, pvalidity):
        bvalid = _valid_mask(bkeys, bvalidity, lb)
        rank = jnp.where(bvalid, 0, 1).astype(jnp.int32)
        rows = lax.broadcasted_iota(jnp.uint32, (bkeys.shape[0],), 0)
        # neutralize invalid keys to the max value so the sorted array is
        # globally key-ordered (searchsorted requirement); the rank tiebreak
        # keeps them after any real max-valued key, and the nvalid_b clamp
        # excludes them from matches.
        maxval = jnp.iinfo(bkeys.dtype).max
        nkeys = jnp.where(bvalid, bkeys, jnp.asarray(maxval, bkeys.dtype))
        srank, skey, sorder = lax.sort([rank, nkeys, rows], num_keys=2, is_stable=True)
        nvalid_b = jnp.sum(bvalid, dtype=jnp.int32)

        pvalid = _valid_mask(pkeys, pvalidity, lp)
        # method="sort" lowers searchsorted to a co-sort instead of per-query
        # binary-search gathers (random gathers are ~40x slower on TPU)
        lo = jnp.searchsorted(skey, pkeys, side="left", method="sort")
        hi = jnp.searchsorted(skey, pkeys, side="right", method="sort")
        # clamp to the valid prefix of the sorted build side
        lo = jnp.minimum(lo, nvalid_b)
        hi = jnp.minimum(hi, nvalid_b)
        cnt = jnp.where(pvalid, hi - lo, 0).astype(jnp.int64)
        offsets = jnp.cumsum(cnt) - cnt
        total = jnp.sum(cnt)
        return total, cnt, offsets, lo, skey, sorder

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
    spec = (
        int(build_keys.data.shape[0]), build_keys.length, build_keys.validity is not None,
        int(probe_keys.data.shape[0]), probe_keys.length, probe_keys.validity is not None,
    )
    cp = _count_program(spec)
    total, cnt, offsets, lo, skey, sorder = cp(
        build_keys.data, build_keys.validity, probe_keys.data, probe_keys.validity
    )
    t = int(total)
    cap = _bucket(t)
    ep = _emit_program(cap)
    probe_idx, build_idx = ep(cnt, offsets, lo, sorder, total)
    dev = probe_keys.device
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
