"""Scan/partition primitives chosen for TPU cost realities.

Measured on-chip (v5e, 4M rows): XLA scatter ~24ms, random gather ~36ms,
stable 2-operand sort ~8ms, scans ~0.05ms.  Therefore every compaction here is
expressed as a stable sort on a 0/1 partition key (selected rows first, original
order preserved) and every segment reduction as a segmented associative scan —
no scatters, no large gathers.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.lax as lax
import jax.numpy as jnp


def stable_partition(flags: jnp.ndarray, operands: Sequence[jnp.ndarray]):
    """Move rows where flags=True to the front (stable), carrying operands.

    Returns the list of permuted operands.  This is the TPU-native compaction:
    one fused multi-operand stable sort on a 1-bit key.
    """
    rank = (~flags).astype(jnp.int32)
    out = lax.sort([rank, *operands], num_keys=1, is_stable=True)
    return out[1:]


def segmented_scan(
    vals: jnp.ndarray, starts: jnp.ndarray, combine: Callable
) -> jnp.ndarray:
    """Inclusive scan of `vals` with `combine`, restarting at rows where
    `starts` is True.

    Implemented as the classic Hillis-Steele segmented scan: log2(n) fused
    elementwise passes of shift+combine.  (The tempting alternative —
    `lax.associative_scan` with a (value, flag) pair operator — lowers to a
    pair-carrying reduce-window whose scoped-VMEM allocation exceeds the TPU's
    16MB limit for multi-million-row inputs.)
    """
    n = vals.shape[0]
    idx = lax.broadcasted_iota(jnp.int32, (n,), 0)
    v, f = vals, starts
    d = 1
    while d < n:
        pv = jnp.roll(v, d)
        pf = jnp.roll(f, d)
        has_pred = idx >= d
        take = has_pred & (~f)
        v = jnp.where(take, combine(pv, v), v)
        f = f | (has_pred & pf)
        d <<= 1
    return v


def segment_ends(starts: jnp.ndarray, n_valid) -> jnp.ndarray:
    """End-of-segment flags given start flags over the valid prefix.

    Row i ends its segment iff row i+1 starts one (or i is the last valid row).
    """
    n = starts.shape[0]
    nxt = jnp.roll(starts, -1).at[n - 1].set(True)
    idx = lax.broadcasted_iota(jnp.int32, (n,), 0)
    in_range = idx < n_valid
    is_last = idx == (n_valid - 1)
    return in_range & (nxt | is_last)
