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


# ---- Pallas LSB radix-sort path (kernels/radix.py) -------------------------

_RADIX_KEY_DTYPES = {
    dt.ArrowType.UINT32, dt.ArrowType.INT32, dt.ArrowType.FLOAT32,
    dt.ArrowType.DATE32, dt.ArrowType.UINT64, dt.ArrowType.INT64,
}


def _radix_encode_key32(data, descending: bool):
    """Map a 32-bit key plane to an i32 whose UNSIGNED bit order is the sort
    order (standard radix encodings; NaNs canonicalized to the maximum so
    they sort last — matching the lax.sort paths — in both directions)."""
    if jnp.issubdtype(data.dtype, jnp.floating):
        y = lax.bitcast_convert_type(data, jnp.int32)
        enc = jnp.where(y < 0, ~y, y | jnp.int32(-0x80000000))
        nan = jnp.isnan(data)
        if descending:
            return jnp.where(nan, jnp.int32(-1), ~enc)
        return jnp.where(nan, jnp.int32(-1), enc)
    if data.dtype in (jnp.int32,):
        enc = lax.bitcast_convert_type(data, jnp.int32) ^ jnp.int32(-0x80000000)
    else:
        enc = lax.bitcast_convert_type(data, jnp.int32)
    return ~enc if descending else enc


def _radix_decode_key32(enc, out_dtype, descending: bool):
    """Inverse of `_radix_encode_key32` for non-float keys (float keys keep
    their original data plane and are emitted via the payload ride-along)."""
    if descending:
        enc = ~enc
    if jnp.dtype(out_dtype) == jnp.int32:
        enc = enc ^ jnp.int32(-0x80000000)
    return lax.bitcast_convert_type(enc, jnp.dtype(out_dtype))


def _radix_auto(keys) -> bool:
    """Whether "auto" picks the radix path: TPU backend at sizes where the
    measured per-pass cost beats lax.sort's O(log^2) comparison network
    (v5e r5 measurement — see docs/sort_design_notes.md).  ARROW_TPU_SORT
    forces "radix"/"xla" for A/B runs (any backend; CPU runs interpreted
    and slowly)."""
    import os

    forced = os.environ.get("ARROW_TPU_SORT")
    if forced == "radix":
        return True
    if forced == "xla":
        return False
    # crossover vs the fused lax.sort: the chain wins clearly at 2^27
    # (525 vs 590 ms) and is roughly at parity near 2^26; below that the
    # per-pass floor and the chain's fixed costs (prep, sig sync, per-
    # dispatch tunnel RTT) lose to one fused sort (~8 ms at 4M)
    return jax.default_backend() == "tpu" and keys.data.shape[0] >= (1 << 26)


def _radix_eligible(keys, payload_cols) -> bool:
    if keys.dtype not in _RADIX_KEY_DTYPES or keys.validity is not None:
        return False
    if keys.data.shape[0] % 8192 != 0:
        return False
    nplanes = (2 if dt.item_size(keys.dtype) == 8 else 1) + (
        1 if keys.dtype is dt.ArrowType.FLOAT32 else 0
    )
    for c in payload_cols:
        kind, has_validity, _ = _payload_colspec(c)
        nplanes += (2 if kind == "w64" else 1) + (1 if has_validity else 0)
        if len(c) != len(keys):
            return False
    return nplanes <= 8


@functools.lru_cache(maxsize=None)
def _radix_prep_program(spec):
    """(n, length, key_dtype_str, descending, colspec) -> jitted encode:
    key planes (padding rows forced to the max encoding so they sort last)
    + payload 32-bit planes + the significant-bit masks per key plane."""
    n, length, key_dtype_str, descending, colspec = spec
    kdt = jnp.dtype(key_dtype_str)
    is64 = kdt.itemsize == 8
    is_f32 = kdt == jnp.float32

    def run(key_data, *flat):
        padded = length < n

        def pad_max(x):  # padding rows get the MAX encoding: they sort last
            if not padded:
                return x
            live = lax.broadcasted_iota(jnp.int32, (n,), 0) < jnp.int32(length)
            return jnp.where(live, x, jnp.int32(-1))

        if is64:
            w = lax.bitcast_convert_type(key_data, jnp.uint32)  # (n, 2) limbs
            lo = lax.bitcast_convert_type(w[:, 0], jnp.int32)
            hi = lax.bitcast_convert_type(w[:, 1], jnp.int32)
            if kdt == jnp.int64:
                hi = hi ^ jnp.int32(-0x80000000)
            if descending:
                lo, hi = ~lo, ~hi
            kplanes = [pad_max(lo), pad_max(hi)]
        else:
            kplanes = [pad_max(_radix_encode_key32(key_data, descending))]
        planes = list(kplanes)
        if is_f32:
            # float keys ride their raw data as a payload plane: the encode
            # is not invertible through NaN canonicalization
            planes.append(lax.bitcast_convert_type(key_data, jnp.int32))
        it = iter(flat)
        for kind, has_validity, _dtype_str in colspec:
            data = next(it)
            validity = next(it) if has_validity else None
            if kind == "bool":
                planes.append(B.unpack_bits(data).astype(jnp.int32))
            elif kind == "w64":
                w = lax.bitcast_convert_type(data, jnp.uint32)
                planes.append(lax.bitcast_convert_type(w[:, 0], jnp.int32))
                planes.append(lax.bitcast_convert_type(w[:, 1], jnp.int32))
            elif kind == "small":
                planes.append(data.astype(jnp.int32))
            else:
                planes.append(
                    lax.bitcast_convert_type(data, jnp.int32)
                    if data.dtype != jnp.int32
                    else data
                )
            if has_validity:
                planes.append(B.unpack_bits(validity).astype(jnp.int32))
        def _orred(k):
            u = k.astype(jnp.uint32)
            return lax.reduce(
                u, jnp.uint32(0), lax.bitwise_or, (0,)
            ) ^ lax.reduce(
                u, jnp.uint32(0xFFFFFFFF), lax.bitwise_and, (0,)
            )

        sig = [_orred(k) for k in kplanes]
        return tuple(planes), jnp.stack(sig)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _plane_ranges(spec):
    """Chain-plane index ranges: (key_range, [per-column ranges])."""
    n, length, key_dtype_str, descending, colspec = spec
    kdt = jnp.dtype(key_dtype_str)
    nk = (2 if kdt.itemsize == 8 else 1) + (1 if kdt == jnp.float32 else 0)
    idx = nk
    col_rngs = []
    for kind, has_validity, _ in colspec:
        w = (2 if kind == "w64" else 1) + (1 if has_validity else 0)
        col_rngs.append((idx, idx + w))
        idx += w
    return (0, nk), col_rngs


@functools.lru_cache(maxsize=None)
def _radix_finish_group(spec, gi: int):
    """Per-plane-group chain epilogue: the stream combine + decode + zero
    tail for ONE plane group (gi == -1: the key; else column gi), fused in
    one pass.  Split per group (r5): a single whole-batch epilogue program
    held every chain stream buffer live across its own intermediates and
    OOMed a 16 GB chip at 2^27 x 2 planes; per-group dispatches let the
    caller drop each group's stream buffers as it goes."""
    n, length, key_dtype_str, descending, colspec = spec
    kdt = jnp.dtype(key_dtype_str)
    is64 = kdt.itemsize == 8
    is_f32 = kdt == jnp.float32

    def run(bounds, parts):
        from .kernels.radix import combine_parts

        npl = len(parts) // (len(bounds) + 1)
        r_ = len(parts) // npl
        planes = [
            combine_parts(
                tuple(parts[t * npl + p] for t in range(r_)), bounds, n
            )
            for p in range(npl)
        ]
        padded = length < n
        live = (
            lax.broadcasted_iota(jnp.int32, (n,), 0) < jnp.int32(length)
            if padded
            else None
        )

        def mask(x):  # zero-padding invariant; a no-op for full buffers
            return jnp.where(live, x, jnp.zeros_like(x)) if padded else x

        def maskb(b):
            return (b & live) if padded else b

        it = iter(planes)
        if gi == -1:
            if is64:
                lo, hi = next(it), next(it)
                if descending:
                    lo, hi = ~lo, ~hi
                if kdt == jnp.int64:
                    hi = hi ^ jnp.int32(-0x80000000)
                key = lax.bitcast_convert_type(
                    jnp.stack([lo, hi], axis=-1), kdt
                )
            elif is_f32:
                next(it)  # encoded plane: the raw data plane follows
                key = lax.bitcast_convert_type(next(it), jnp.float32)
            else:
                key = _radix_decode_key32(next(it), kdt, descending)
            return mask(key)
        kind, has_validity, dtype_str = colspec[gi]
        if kind == "bool":
            data = B.pack_bits(maskb(next(it) != 0))
        elif kind == "w64":
            lo, hi = next(it), next(it)
            data = mask(
                lax.bitcast_convert_type(
                    jnp.stack([lo, hi], axis=-1), jnp.dtype(dtype_str)
                )
            )
        else:
            o = lax.bitcast_convert_type(next(it), jnp.int32)
            o = (
                o.astype(jnp.dtype(dtype_str))
                if kind == "small"
                else lax.bitcast_convert_type(o, jnp.dtype(dtype_str))
            )
            data = mask(o)
        validity = (
            B.pack_bits(maskb(next(it) != 0)) if has_validity else None
        )
        return data, validity

    return jax.jit(run)


def _sort_radix(keys, payload_cols, descending: bool = False):
    """Multi-pass LSB radix sort (kernels/radix.py): the BASELINE-named sort
    algorithm.  One compiled Pallas pass program serves every bit; passes
    chain as async dispatches over only the SIGNIFICANT key bits (one tiny
    host sync reads the OR^AND bit mask).  64-bit keys run lo-limb bits then
    hi-limb bits with the limb planes swapped between chains (LSD across
    limbs — each chain is stable, so the composition is the 64-bit order)."""
    from .kernels.radix import radix_sort_chain, radix_sort_chain_parts

    colspec = tuple(_payload_colspec(c) for c in payload_cols)
    spec = (
        int(keys.data.shape[0]), keys.length,
        str(jnp.dtype(keys.data.dtype)), bool(descending), colspec,
    )
    flat = []
    for c in payload_cols:
        flat.append(c.data)
        if c.validity is not None:
            flat.append(c.validity)
    planes, sig = _radix_prep_program(spec)(keys.data, *flat)
    sig = [int(s) for s in sig]  # ONE host sync for the pass list
    n = int(keys.data.shape[0])
    nk = len(sig)
    bits_lo = [b for b in range(32) if (sig[0] >> b) & 1]
    bits_hi = (
        [b for b in range(32) if (sig[1] >> b) & 1] if nk == 2 else []
    )
    if bits_hi:
        # hi limb becomes plane 0 for the second chain (LSD across limbs)
        out = radix_sort_chain(planes, bits_lo, n)
        perm = [1, 0] + list(range(2, len(out)))
        streams, bounds = radix_sort_chain_parts(
            [out[i] for i in perm], bits_hi, n
        )
        streams = tuple(
            tuple(st[perm.index(i)] for i in range(len(st))) for st in streams
        )
    else:
        streams, bounds = radix_sort_chain_parts(planes, bits_lo, n)
    key_rng, col_rngs = _plane_ranges(spec)
    streams = [list(st) for st in streams]
    bounds = tuple(bounds)

    def take_group(rng):
        parts = tuple(
            streams[t][p] for t in range(len(streams))
            for p in range(rng[0], rng[1])
        )
        for t in range(len(streams)):  # drop refs as groups finish
            for p in range(rng[0], rng[1]):
                streams[t][p] = None
        return parts

    key_out = _radix_finish_group(spec, -1)(bounds, take_group(key_rng))
    out_keys = make_array(key_out, None, keys.length, keys.dtype, keys.device)
    out_cols = []
    for ci, (c, rng) in enumerate(zip(payload_cols, col_rngs)):
        d, v = _radix_finish_group(spec, ci)(bounds, take_group(rng))
        out_cols.append(make_array(d, v, c.length, c.dtype, c.device))
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
    if method == "radix" and not _radix_eligible(a, []):
        raise OperationNotSupported(
            "radix sort requires a non-null u32/i32/f32/date32/u64/i64 key "
            "whose padded buffer length is a multiple of 8192"
        )
    if method in ("auto", "radix") and _radix_eligible(a, []) and (
        method == "radix" or _radix_auto(a)
    ):
        out_keys, _ = _sort_radix(a, [], descending)
        return out_keys
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
    pcols = (
        list(payload.columns().values())
        if isinstance(payload, RecordBatch)
        else ([payload] if payload is not None else [])
    )
    if method in ("auto", "radix") and _radix_eligible(keys, pcols) and (
        method == "radix" or _radix_auto(keys)
    ):
        ok, outs = _sort_radix(keys, pcols, descending)
        if payload is None:
            return ok, None
        if isinstance(payload, RecordBatch):
            return ok, RecordBatch(dict(zip(payload.columns().keys(), outs)))
        return ok, outs[0]
    if method == "radix":
        raise OperationNotSupported(
            "radix sort requires a non-null u32/i32/f32/date32/u64/i64 key, "
            "padded buffer length a multiple of 8192, and <= 8 total 32-bit "
            "planes across key and payload columns"
        )
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
