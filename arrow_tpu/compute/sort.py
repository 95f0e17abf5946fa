"""Sort operators: stable sort / argsort / sort-by-key with payload columns.

Net-new north-star operator (BASELINE.md: "radix sort: 1B-row u32/i64 key +
payload, stable multi-pass LSB").  The reference has no sort; its multi-pass
reduction (SURVEY.md §3.5) is the compositional seed.

Backends (``method=``): "xla" (the default and the "auto" choice) =
`jax.lax.sort(..., is_stable=True)`, XLA's fused multi-operand network;
"merge" = the Pallas streaming pairwise-merge sort (`kernels/merge.py`): ONE
batched 8192-run XLA sort then log2(n/8192) merge passes.  Measured on v5e at
134M rows the merge path is ~2.4x SLOWER than the flat lax.sort (91.6 ms per
pass, DMA-latency-bound — diagnosis in docs/sort_design_notes.md), so it is
explicit-opt-in only; it remains useful where its runtime run-length is (a
merge of pre-sorted runs costs one pass, not a re-sort).  Payload columns of
any width ride the merge path as 32-bit planes (64-bit columns split into
lo/hi limb planes, bool/validity bitmaps unpack to word planes) — every plane
follows the same permutation, so recombination is exact.

Null ordering: valid rows first (stable), null rows last — implemented by
sorting on a (is_null, key) compound, with only the row payload permuted.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.lax as lax
import jax.numpy as jnp

from .. import dtypes as dt
from ..array.array import ArrowArrayBase, make_array
from ..errors import OperationNotSupported
from ..table import RecordBatch
from ..utils import bits as B

_SORTABLE = {
    dt.ArrowType.UINT8, dt.ArrowType.UINT16, dt.ArrowType.UINT32, dt.ArrowType.UINT64,
    dt.ArrowType.INT8, dt.ArrowType.INT16, dt.ArrowType.INT32, dt.ArrowType.INT64,
    dt.ArrowType.FLOAT32, dt.ArrowType.FLOAT64, dt.ArrowType.DATE32,
}


def _sort_keys(data, validity, length, descending: bool):
    """Build compound sort keys: (padding/null last, key order)."""
    n = data.shape[0]
    idx = lax.broadcasted_iota(jnp.int32, (n,), 0)
    in_range = idx < length
    if validity is not None:
        valid = B.unpack_bits(validity) & in_range
    else:
        valid = in_range
    # primary key: 0 = real value, 1 = null, 2 = padding (stays at the end)
    rank = jnp.where(in_range, jnp.where(valid, 0, 1), 2).astype(jnp.int32)
    key = lax.select(valid, data, jnp.zeros_like(data))  # neutralize NaN/garbage
    if descending:
        if jnp.issubdtype(data.dtype, jnp.floating):
            key = -key
        else:
            key = ~key if jnp.issubdtype(data.dtype, jnp.unsignedinteger) else jnp.invert(key)
    return rank, key


# ---- Pallas merge-sort path (kernels/merge.py) -----------------------------

_MERGE_KEY_DTYPES = {
    dt.ArrowType.UINT32, dt.ArrowType.INT32, dt.ArrowType.FLOAT32, dt.ArrowType.DATE32,
}


def _payload_colspec(col) -> Tuple[str, bool, str]:
    """(kind, has_validity, dtype_str) describing how a payload column rides
    the merge kernel as 32-bit planes."""
    if col.dtype is dt.ArrowType.BOOL:
        kind = "bool"
    elif dt.item_size(col.dtype) == 8:
        kind = "w64"
    elif dt.item_size(col.dtype) < 4:
        kind = "small"
    else:
        kind = "w32"
    return (kind, col.validity is not None, str(jnp.dtype(col.data.dtype)))


def _merge_eligible(keys, descending: bool, force: bool = False) -> bool:
    """Merge runs only when EXPLICITLY requested (method="merge" or
    ARROW_TPU_FORCE_MERGE=1): measured on v5e at 128M rows the streaming
    merge kernel is ~2.4x slower than XLA's flat sort (91.6 ms/pass x 14
    passes, DMA-latency-bound at ~2.8 us/step — see docs/sort_design_notes),
    so "auto" stays on lax.sort."""
    import os

    if descending or keys.validity is not None:
        return False
    if keys.dtype not in _MERGE_KEY_DTYPES:
        return False
    if keys.data.shape[0] % 8192 != 0:
        return False
    return force or os.environ.get("ARROW_TPU_FORCE_MERGE") == "1"


@functools.lru_cache(maxsize=None)
def _merge_sort_program(spec):
    """spec: (n, length, colspec) — one jitted program: encode payload
    columns to 32-bit planes, run the Pallas merge sort, decode + re-establish
    the zero-padding invariant."""
    n, length, colspec = spec
    from .kernels.merge import sort_kv_pallas

    def run(key_data, *flat):
        planes = []
        it = iter(flat)
        for kind, has_validity, _dtype_str in colspec:
            data = next(it)
            validity = next(it) if has_validity else None
            if kind == "bool":
                planes.append(B.unpack_bits(data).astype(jnp.int32))
            elif kind == "w64":
                w = lax.bitcast_convert_type(data, jnp.uint32)  # (n, 2) limbs
                planes.append(w[:, 0])
                planes.append(w[:, 1])
            elif kind == "small":
                planes.append(data.astype(jnp.int32))
            else:
                planes.append(data)
            if has_validity:
                planes.append(B.unpack_bits(validity).astype(jnp.int32))
        out_k, outs = sort_kv_pallas(key_data, tuple(planes), length=length)
        live = lax.broadcasted_iota(jnp.int32, (n,), 0) < jnp.int32(length)
        out_k = jnp.where(live, out_k, jnp.zeros_like(out_k))
        results = []
        oi = iter(outs)
        for kind, has_validity, dtype_str in colspec:
            if kind == "bool":
                results.append(B.pack_bits((next(oi) != 0) & live))
            elif kind == "w64":
                lo, hi = next(oi), next(oi)
                w = lax.bitcast_convert_type(
                    jnp.stack([lo, hi], axis=-1), jnp.dtype(dtype_str)
                )
                results.append(jnp.where(live, w, jnp.zeros_like(w)))
            elif kind == "small":
                o = next(oi).astype(jnp.dtype(dtype_str))
                results.append(jnp.where(live, o, jnp.zeros_like(o)))
            else:
                o = next(oi)
                results.append(jnp.where(live, o, jnp.zeros_like(o)))
            if has_validity:
                results.append(B.pack_bits((next(oi) != 0) & live))
            else:
                results.append(None)
        return out_k, results

    return jax.jit(run)


def _sort_merge(keys, payload_cols):
    """Run the merge-sort program; returns (keys_array, [payload arrays])."""
    colspec = tuple(_payload_colspec(c) for c in payload_cols)
    flat = []
    for c in payload_cols:
        flat.append(c.data)
        if c.validity is not None:
            flat.append(c.validity)
    prog = _merge_sort_program((int(keys.data.shape[0]), keys.length, colspec))
    out_k, results = prog(keys.data, *flat)
    out_keys = make_array(out_k, None, keys.length, keys.dtype, keys.device)
    out_cols = [
        make_array(d, v, c.length, c.dtype, c.device)
        for c, d, v in zip(payload_cols, results[::2], results[1::2])
    ]
    return out_keys, out_cols


@functools.partial(jax.jit, static_argnums=(2, 3))
def _argsort_program(data, validity, length, descending, *payloads):
    rank, key = _sort_keys(data, validity, length, descending)
    n = data.shape[0]
    rows = lax.broadcasted_iota(jnp.uint32, (n,), 0)
    operands = [rank, key, rows, *payloads]
    out = lax.sort(operands, num_keys=2, is_stable=True)
    return out[1:]  # sorted key, row order, sorted payloads


@functools.lru_cache(maxsize=None)
def _merge_argsort_program(spec):
    n, length = spec
    from .kernels.merge import sort_kv_pallas

    def run(key_data):
        rows = lax.broadcasted_iota(jnp.uint32, (n,), 0)
        _, (order,) = sort_kv_pallas(key_data, (rows,), length=length)
        live = rows < jnp.uint32(length)
        return jnp.where(live, order, jnp.zeros_like(order))

    return jax.jit(run)


def argsort(a: ArrowArrayBase, descending: bool = False) -> ArrowArrayBase:
    """Stable permutation (UInt32Array) sorting `a` (nulls last)."""
    if a.dtype not in _SORTABLE:
        raise OperationNotSupported(f"sort not supported for {a.dtype.value}")
    if _merge_eligible(a, descending):
        prog = _merge_argsort_program((int(a.data.shape[0]), a.length))
        order = prog(a.data)
        return make_array(order, None, a.length, dt.ArrowType.UINT32, a.device)
    outs = _argsort_program(a.data, a.validity, a.length, descending)
    order = outs[1]
    return make_array(order, None, a.length, dt.ArrowType.UINT32, a.device)


def sort(
    a: ArrowArrayBase, descending: bool = False, method: str = "auto"
) -> ArrowArrayBase:
    """Stable sort of one column, nulls last.

    method: "xla" (default, and what "auto" resolves to) = `lax.sort`;
    "merge" = the Pallas streaming merge sort (32-bit non-null ascending
    keys; explicit opt-in — measured slower than lax.sort at 128M, see
    docs/sort_design_notes.md).  ARROW_TPU_FORCE_MERGE=1 also opts "auto"
    in (test/benchmark knob; applies even on CPU, where the kernel runs
    interpreted and slowly).
    """
    if a.dtype not in _SORTABLE:
        raise OperationNotSupported(f"sort not supported for {a.dtype.value}")
    if method == "merge" and not _merge_eligible(a, descending, force=True):
        raise OperationNotSupported(
            "merge sort requires a 32-bit non-null ascending key whose padded "
            "buffer length is a multiple of 8192"
        )
    if method in ("auto", "merge") and _merge_eligible(
        a, descending, force=method == "merge"
    ):
        out_keys, _ = _sort_merge(a, [])
        return out_keys
    if a.validity is None and not descending:
        sorted_key, _ = _argsort_program(a.data, None, a.length, descending)
        return make_array(sorted_key, None, a.length, a.dtype, a.device)
    # nulls or descending: permute data (+validity) by the sort order — the
    # program's key operand is order-transformed, so it can't be returned as-is
    from ..kernels import take as _take

    return _take(a, argsort(a, descending))


def sort_by_key(
    keys: ArrowArrayBase,
    payload: Union[ArrowArrayBase, RecordBatch, None] = None,
    descending: bool = False,
    method: str = "auto",
):
    """Stable key+payload sort (the 1B-row bench shape: key column + payload).

    method "merge" routes through the Pallas streaming merge sort with every
    payload column riding as 32-bit planes (see module docstring); "xla" uses
    one fused `lax.sort` for simple payloads, else a permutation gather.
    "auto" picks merge when eligible on TPU.  Returns (sorted_keys,
    sorted_payload).
    """
    if keys.dtype not in _SORTABLE:
        raise OperationNotSupported(f"sort not supported for {keys.dtype.value}")
    if method in ("auto", "merge") and _merge_eligible(
        keys, descending, force=method == "merge"
    ):
        if payload is None:
            ok, _ = _sort_merge(keys, [])
            return ok, None
        pcols = (
            list(payload.columns().values())
            if isinstance(payload, RecordBatch)
            else [payload]
        )
        if all(len(c) == len(keys) for c in pcols):
            ok, outs = _sort_merge(keys, pcols)
            if isinstance(payload, RecordBatch):
                return ok, RecordBatch(dict(zip(payload.columns().keys(), outs)))
            return ok, outs[0]
    if method == "merge":
        raise OperationNotSupported(
            "merge sort requires a 32-bit non-null ascending key whose padded "
            "buffer length is a multiple of 8192, and equal-length payload "
            "columns"
        )
    simple_cols: dict = {}
    if isinstance(payload, ArrowArrayBase):
        simple = payload.validity is None and payload.dtype is not dt.ArrowType.BOOL
        if simple:
            outs = _argsort_program(
                keys.data, keys.validity, keys.length, descending, payload.data
            )
            sk, order, sp = outs
            out_keys = _wrap_sorted_keys(keys, sk, order, descending)
            return out_keys, make_array(sp, None, payload.length, payload.dtype, payload.device)
        order_arr = argsort(keys, descending)
        from ..kernels import take as _take

        return _take(keys, order_arr), _take(payload, order_arr)
    if isinstance(payload, RecordBatch):
        order_arr = argsort(keys, descending)
        from ..kernels import take as _take

        return _take(keys, order_arr), payload.take(order_arr)
    return sort(keys, descending), None


def lex_sort(
    keys: "list[ArrowArrayBase]",
    payload: Union[ArrowArrayBase, RecordBatch, None] = None,
    descending: bool = False,
):
    """Lexicographic multi-key stable sort (first key most significant).

    Extension beyond the reference (which has no sort at all); one fused
    `lax.sort` carries all key columns and the row permutation.
    """
    if not keys:
        raise OperationNotSupported("lex_sort needs at least one key column")
    for k in keys:
        if k.dtype not in _SORTABLE or k.validity is not None:
            raise OperationNotSupported("lex_sort keys must be non-null primitives")
    n = keys[0].length
    npad = keys[0].data.shape[0]
    idx = lax.broadcasted_iota(jnp.int32, (npad,), 0)
    rank = jnp.where(idx < n, 0, 1).astype(jnp.int32)
    ops = [rank]
    for k in keys:
        kd = k.data
        if descending:
            if jnp.issubdtype(kd.dtype, jnp.floating):
                kd = -kd
            else:
                kd = ~kd
        ops.append(kd)
    rows = lax.broadcasted_iota(jnp.uint32, (npad,), 0)
    ops.append(rows)
    out = lax.sort(ops, num_keys=1 + len(keys), is_stable=True)
    order = make_array(out[-1], None, n, dt.ArrowType.UINT32, keys[0].device)
    from ..kernels import take as _take

    sorted_keys = [_take(k, order) for k in keys]
    if payload is None:
        return sorted_keys, None, order
    sorted_payload = (
        payload.take(order) if isinstance(payload, RecordBatch) else _take(payload, order)
    )
    return sorted_keys, sorted_payload, order


def _wrap_sorted_keys(keys, sorted_data, order, descending):
    if keys.validity is None and not descending:
        return make_array(sorted_data, None, keys.length, keys.dtype, keys.device)
    from ..kernels import take as _take

    return _take(keys, make_array(order, None, keys.length, dt.ArrowType.UINT32, keys.device))
