"""Sharded columnar batches: tables partitioned across a device mesh.

Net-new component (BASELINE.md north star: "tables hash-partitioned per chip,
`jax.Array` + `NamedSharding`").  Layout: every column buffer carries a leading
shard dimension —

  data:     (P, cap)        sharded  P(axis, None)   cap rows per shard
  validity: (P, cap//32)    packed uint32 words, same layout as single-chip
  counts:   (P,)            per-shard logical row counts (device-resident, so
                            distributed ops never host-sync mid-pipeline)

shard_map programs see the local (1, cap) block; XLA lays each shard in its
chip's HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import dtypes as dt
from ..array.array import ArrowArrayBase, make_array, pad_len
from ..errors import ArrowTpuError
from ..table import RecordBatch
from ..utils import bits as B
from .mesh import MeshRuntime


@dataclasses.dataclass
class ShardedColumn:
    data: jax.Array  # (P, cap) value buffer ((P, cap//32) words for BOOL)
    validity: Optional[jax.Array]  # (P, cap//32) packed words
    dtype: dt.ArrowType

    @property
    def num_shards(self) -> int:
        return int(self.data.shape[0])

    @property
    def capacity(self) -> int:
        if self.dtype is dt.ArrowType.BOOL:
            return int(self.data.shape[1]) * B.WORD_BITS
        return int(self.data.shape[1])


@dataclasses.dataclass
class ShardedBatch:
    columns: Dict[str, ShardedColumn]
    counts: jax.Array  # (P,) int32 logical rows per shard
    runtime: MeshRuntime

    @property
    def num_shards(self) -> int:
        return int(self.counts.shape[0])

    @property
    def capacity(self) -> int:
        return next(iter(self.columns.values())).capacity

    def num_rows(self) -> int:
        return int(jnp.sum(self.counts))

    def column(self, name: str) -> ShardedColumn:
        return self.columns[name]

    def __getitem__(self, name: str) -> ShardedColumn:
        return self.columns[name]

    @property
    def column_names(self):
        return list(self.columns)

    def __repr__(self) -> str:
        cols = ", ".join(f"{n}: {c.dtype.value}" for n, c in self.columns.items())
        return (
            f"ShardedBatch(shards={self.num_shards}, cap={self.capacity}, "
            f"rows={self.num_rows()}, columns=[{cols}])"
        )


def _shard_cap(n: int, p: int, slack: float = 1.0) -> int:
    per = -(-n // p)
    return max(pad_len(int(per * slack)), 1024)


def shard_batch(
    batch: RecordBatch, runtime: MeshRuntime, capacity: Optional[int] = None
) -> ShardedBatch:
    """Contiguous row-range partitioning of a host-resident batch onto the mesh
    (the cheap initial placement; use `shuffle.hash_partition` for key-based)."""
    p = runtime.num_shards
    n = batch.num_rows
    cap = capacity or _shard_cap(n, p)
    counts_np = np.full(p, n // p, np.int32)
    counts_np[: n % p] += 1
    if counts_np.max() > cap:
        raise ArrowTpuError(f"capacity {cap} < max shard rows {counts_np.max()}")
    offsets = np.concatenate([[0], np.cumsum(counts_np)[:-1]])

    cols = {}
    for name, col in batch.columns().items():
        if col.dtype is dt.ArrowType.BOOL:
            host_bits = np.asarray(col.data)
            bools = B.unpack_bits_np(host_bits, col.length)
            buf = np.zeros((p, cap // 32), np.uint32)
            for s in range(p):
                seg = bools[offsets[s] : offsets[s] + counts_np[s]]
                buf[s] = B.pack_bits_np(seg, cap // 32)
        else:
            host = col.raw_values()
            buf = np.zeros((p, cap), dtype=host.dtype)
            for s in range(p):
                buf[s, : counts_np[s]] = host[offsets[s] : offsets[s] + counts_np[s]]
        v = None
        if col.validity is not None:
            mask = B.unpack_bits_np(np.asarray(col.validity), col.length)
            v = np.zeros((p, cap // 32), np.uint32)
            for s in range(p):
                seg = mask[offsets[s] : offsets[s] + counts_np[s]]
                v[s] = B.pack_bits_np(seg, cap // 32)
        sh = runtime.sharding(runtime.axis)
        cols[name] = ShardedColumn(
            jax.device_put(buf, runtime.sharding(runtime.axis, None)),
            None if v is None else jax.device_put(v, runtime.sharding(runtime.axis, None)),
            col.dtype,
        )
    counts = jax.device_put(counts_np, runtime.sharding(runtime.axis))
    return ShardedBatch(cols, counts, runtime)


def gather_batch(sb: ShardedBatch) -> RecordBatch:
    """Collect a ShardedBatch back to a host RecordBatch (shard order)."""
    counts = np.asarray(sb.counts)
    cols = {}
    for name, col in sb.columns.items():
        if col.dtype is dt.ArrowType.BOOL:
            words = np.asarray(col.data)
            parts = [
                B.unpack_bits_np(words[s], int(counts[s])) for s in range(sb.num_shards)
            ]
            bools = np.concatenate(parts) if parts else np.zeros(0, bool)
            arr_v = None
            if col.validity is not None:
                vw = np.asarray(col.validity)
                vparts = [
                    B.unpack_bits_np(vw[s], int(counts[s])) for s in range(sb.num_shards)
                ]
                arr_v = np.concatenate(vparts)
            from ..array.boolean import BooleanArray

            out = BooleanArray.from_slice(bools)
            if arr_v is not None:
                out = BooleanArray.from_optional_slice(
                    [bool(b) if m else None for b, m in zip(bools, arr_v)]
                )
            cols[name] = out
        else:
            host = np.asarray(col.data)
            vals = np.concatenate(
                [host[s, : counts[s]] for s in range(sb.num_shards)]
            )
            from ..array.array import PrimitiveArray

            arr = PrimitiveArray.from_slice(vals, dtype=col.dtype)
            if col.validity is not None:
                vw = np.asarray(col.validity)
                mask = np.concatenate(
                    [
                        B.unpack_bits_np(vw[s], int(counts[s]))
                        for s in range(sb.num_shards)
                    ]
                )
                from ..array.array import pad_words

                words = B.pack_bits_np(mask, pad_words(vals.shape[0]))
                arr = make_array(
                    arr.data, jax.device_put(words), vals.shape[0], col.dtype
                )
            cols[name] = arr
    return RecordBatch(cols)
