"""Host IO: Arrow-layout export/import and table persistence.

The reference has no persistence layer (SURVEY.md §5 "Checkpoint/resume:
none — read back via values() and serialize yourself"); this module is the
engine-side half of that contract: columns round-trip through Arrow's buffer
layout (dense values + LSB-first validity bitmap bytes), so external Arrow
implementations can consume them zero-copy, plus npz save/load for tables.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from . import dtypes as dt
from .array.array import PrimitiveArray, make_array, pad_len, pad_words
from .array.boolean import BooleanArray
from .table import RecordBatch
from .utils import bits as B


def to_arrow_buffers(arr) -> Dict[str, np.ndarray]:
    """Export an array as Arrow-layout host buffers.

    Returns {"data": values, "validity": bitmap bytes or None, "length": n,
    "null_count": Arrow field metadata (0 without a bitmap)}.
    For BOOL, data is the packed bitmap bytes (Arrow boolean layout).
    """
    from .runtime.native import popcount_native

    n = arr.length
    if arr.dtype is dt.ArrowType.BOOL:
        data = np.asarray(arr.data).view(np.uint8)[: (n + 7) // 8].copy()
    else:
        data = arr.raw_values().copy()
    validity = None
    null_count = 0
    if arr.validity is not None:
        words = np.asarray(arr.validity)
        validity = words.view(np.uint8)[: (n + 7) // 8].copy()
        # padding bits of the validity words are zero by library invariant,
        # so the word popcount counts exactly the valid rows
        set_bits = popcount_native(words)
        if set_bits is None:  # no native library: numpy fallback
            set_bits = int(np.bitwise_count(words).sum()) if hasattr(np, "bitwise_count") else int(
                np.unpackbits(words.view(np.uint8)).sum()
            )
        null_count = n - set_bits
    return {
        "data": data,
        "validity": validity,
        "length": n,
        "null_count": null_count,
    }


def from_arrow_buffers(
    data: np.ndarray,
    length: int,
    validity: Optional[np.ndarray] = None,
    dtype: Optional[dt.ArrowType] = None,
    device=None,
):
    """Import Arrow-layout host buffers into a device array."""
    import jax

    if dtype is dt.ArrowType.BOOL:
        by = np.zeros(pad_words(length) * 4, np.uint8)
        by[: data.shape[0]] = data.view(np.uint8)
        words = by.view(np.uint32)
        v = None
        if validity is not None:
            vb = np.zeros(pad_words(length) * 4, np.uint8)
            vb[: validity.shape[0]] = validity
            v = jax.device_put(vb.view(np.uint32))
        return BooleanArray(jax.device_put(words), v, length)
    dtype = dtype or dt.from_numpy_dtype(data.dtype)
    buf = np.zeros(pad_len(length), dtype=dt.info(dtype).numpy)
    buf[:length] = data[:length]
    v = None
    if validity is not None:
        vb = np.zeros(pad_words(length) * 4, np.uint8)
        vb[: validity.shape[0]] = validity
        v = jax.device_put(vb.view(np.uint32))
    return make_array(jax.device_put(buf), v, length, dtype, device)


def save_table(path: str, batch: RecordBatch) -> None:
    """Persist a RecordBatch to an .npz file (Arrow buffer layout per column)."""
    payload: Dict[str, np.ndarray] = {"__length__": np.int64(batch.num_rows)}
    for name, col in batch.columns().items():
        ex = to_arrow_buffers(col)
        payload[f"d::{name}"] = ex["data"]
        payload[f"t::{name}"] = np.str_(col.dtype.value)
        if ex["validity"] is not None:
            payload[f"v::{name}"] = ex["validity"]
    np.savez(path, **payload)


def load_table(path: str, device=None) -> RecordBatch:
    """Load a RecordBatch saved by save_table."""
    z = np.load(path, allow_pickle=False)
    length = int(z["__length__"])
    cols = {}
    for key in z.files:
        if not key.startswith("d::"):
            continue
        name = key[3:]
        dtype = dt.ArrowType(str(z[f"t::{name}"]))
        validity = z[f"v::{name}"] if f"v::{name}" in z.files else None
        cols[name] = from_arrow_buffers(z[key], length, validity, dtype, device)
    return RecordBatch(cols)
