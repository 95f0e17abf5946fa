"""Hash aggregate: GROUP BY key with SUM / COUNT / MIN / MAX / MEAN.

Net-new north-star operator (BASELINE.md: "hash aggregate: GROUP BY u32,
SUM/COUNT/MIN/MAX, 1K-100M distinct keys incl. skew, >=80% HBM roofline").  The
reference's only reduction-class kernels — Sum and any/all (SURVEY.md §2 #13/#15)
— are the seeds of this tier.

Design (TPU-native): grouping is sort-based inside one fused XLA program — a
stable key sort (XLA's native TPU sort emitter), boundary detection, and
segment reductions via one-pass scatter-adds onto group slots:

  order        = argsort(keys)                  (nulls/padding ranked last)
  starts[i]    = sorted_key[i] != sorted_key[i-1]
  segment_id   = cumsum(starts) - 1
  group_agg    = zeros(n).at[segment_id].{add,min,max}(sorted_values)

This is robust to arbitrary key counts (1K..100M distinct) and heavy-hitter
skew: skew only changes segment lengths, not the program.  The result buffers
have input capacity; the host-synced group count is the logical length (one
executable across all key distributions, like the filter operator).

Null semantics (the reference defines none for aggregates): rows with a NULL
key are dropped; NULL values are skipped by sum/min/max and not counted by
count (standard SQL/Arrow semantics, documented extension).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.lax as lax
import jax.numpy as jnp

from .. import dtypes as dt
from ..array.array import ArrowArrayBase, make_array
from ..errors import OperationNotSupported
from ..table import RecordBatch
from ..utils import bits as B

AGG_KINDS = ("sum", "count", "min", "max", "mean")


def _valid_bools(data, validity, length):
    n = data.shape[0]
    idx = lax.broadcasted_iota(jnp.int32, (n,), 0)
    in_range = idx < length
    if validity is None:
        return in_range
    return B.unpack_bits(validity) & in_range


@functools.lru_cache(maxsize=None)
def _groupby_program(spec: tuple):
    """spec: (n_padded, length, key_has_validity, ((agg, val_dtype, val_has_validity), ...))"""
    n_padded, length, key_has_validity, agg_spec = spec

    def run(key_data, key_validity, *val_bufs):
        kvalid = _valid_bools(key_data, key_validity, length)
        n = key_data.shape[0]
        rows = lax.broadcasted_iota(jnp.uint32, (n,), 0)
        rank = jnp.where(kvalid, 0, 1).astype(jnp.int32)
        srank, skey, sorder = lax.sort(
            [rank, key_data, rows], num_keys=2, is_stable=True
        )
        in_group = srank == 0
        prev = jnp.roll(skey, 1)
        starts = in_group & (
            (jnp.roll(in_group, 1) == 0) | (skey != prev)
        )
        starts = starts.at[0].set(in_group[0])
        seg = jnp.cumsum(starts.astype(jnp.int32)) - 1
        num_groups = jnp.sum(starts, dtype=jnp.uint32)
        tgt = jnp.where(in_group, seg, n)  # dropped rows scatter out of bounds

        out_keys = jnp.zeros((n,), key_data.dtype).at[tgt].set(skey, mode="drop")

        outs = [num_groups, out_keys]
        vi = 0
        for agg, val_dtype_str, val_has_validity in agg_spec:
            if agg == "count_all":
                counts = jnp.zeros((n,), jnp.int64).at[tgt].add(1, mode="drop")
                outs.append(counts)
                continue
            vdt = jnp.dtype(val_dtype_str)
            vdata = val_bufs[vi]
            vvalidity = val_bufs[vi + 1] if val_has_validity else None
            vi += 2 if val_has_validity else 1
            svals = vdata[sorder]
            vvalid = _valid_bools(vdata, vvalidity, length)[sorder] & in_group
            vt = jnp.where(vvalid, seg, n)
            if agg in ("sum", "mean"):
                acc_dt = jnp.float64 if jnp.issubdtype(vdt, jnp.floating) else jnp.int64
                if vdt == jnp.uint64:
                    acc_dt = jnp.uint64
                ssum = (
                    jnp.zeros((n,), acc_dt).at[vt].add(svals.astype(acc_dt), mode="drop")
                )
                if agg == "sum":
                    outs.append(ssum.astype(vdt))
                else:
                    cnt = jnp.zeros((n,), jnp.int64).at[vt].add(1, mode="drop")
                    outs.append(
                        ssum.astype(jnp.float64) / jnp.maximum(cnt, 1).astype(jnp.float64)
                    )
            elif agg == "count":
                outs.append(jnp.zeros((n,), jnp.int64).at[vt].add(1, mode="drop"))
            elif agg == "min":
                init = (
                    jnp.inf if jnp.issubdtype(vdt, jnp.floating) else jnp.iinfo(vdt).max
                )
                red = jnp.full((n,), init, vdt).at[vt].min(svals, mode="drop")
                outs.append(red)
            elif agg == "max":
                init = (
                    -jnp.inf if jnp.issubdtype(vdt, jnp.floating) else jnp.iinfo(vdt).min
                )
                red = jnp.full((n,), init, vdt).at[vt].max(svals, mode="drop")
                outs.append(red)
            else:
                raise OperationNotSupported(f"unknown aggregation {agg!r}")
        return tuple(outs)

    return jax.jit(run)


def hash_aggregate(
    keys: ArrowArrayBase,
    aggregations: Sequence[Tuple[str, Optional[ArrowArrayBase], str]],
) -> RecordBatch:
    """GROUP BY `keys` computing `aggregations`: (out_name, value_column, kind).

    kind in {sum, count, min, max, mean}; value_column None + kind "count"
    counts rows per group.  Returns a RecordBatch with column "key" + one column
    per aggregation; group order = ascending key order.
    """
    if not dt.is_integer(keys.dtype) and keys.dtype is not dt.ArrowType.DATE32:
        raise OperationNotSupported(f"group-by key dtype {keys.dtype.value} unsupported")
    agg_spec = []
    val_bufs: List = []
    for name, col, kind in aggregations:
        if kind not in AGG_KINDS:
            raise OperationNotSupported(f"unknown aggregation {kind!r}")
        if col is None:
            if kind != "count":
                raise OperationNotSupported("only count may omit the value column")
            agg_spec.append(("count_all", "", False))
            continue
        if len(col) != len(keys):
            raise OperationNotSupported("value column length mismatch")
        if col.dtype is dt.ArrowType.BOOL:
            raise OperationNotSupported("bool value columns unsupported")
        agg_spec.append((kind, str(jnp.dtype(col.data.dtype)), col.validity is not None))
        val_bufs.append(col.data)
        if col.validity is not None:
            val_bufs.append(col.validity)

    spec = (
        int(keys.data.shape[0]),
        keys.length,
        keys.validity is not None,
        tuple(agg_spec),
    )
    prog = _groupby_program(spec)
    outs = prog(keys.data, keys.validity, *val_bufs)
    num_groups = int(outs[0])
    device = keys.device

    def _wrap(buf, dtype):
        return make_array(buf, None, num_groups, dtype, device)

    cols: Dict[str, ArrowArrayBase] = {"key": _wrap(outs[1], keys.dtype)}
    for (name, col, kind), buf in zip(aggregations, outs[2:]):
        if kind == "count":
            cols[name] = _wrap(buf, dt.ArrowType.INT64)
        elif kind == "mean":
            cols[name] = _wrap(buf, dt.ArrowType.FLOAT64)
        else:
            cols[name] = _wrap(buf, col.dtype)
    return RecordBatch(cols)
