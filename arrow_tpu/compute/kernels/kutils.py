"""Shared in-kernel helpers for the Pallas tier (Mosaic-safe idioms).

This repo runs with jax_enable_x64=True, under which `jnp.take_along_axis`
promotes its indices to int64 (`jax/_src/numpy/indexing.py` calls
`int_dtype_for_dim(a.shape, ...)` which falls back to the default int dtype)
— and 64-bit converts are unsupported inside Mosaic kernels.  `taa_lanes`
emits the identical gather primitive with int32 indices.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp


def taa_lanes(x, idx):
    """`jnp.take_along_axis(x, idx, axis=-1)` for 2-D x with int32 indices.

    idx must be int32 and in-bounds; this is the dynamic lane gather the
    Mosaic backend supports (probe: tools/mosaic_probe.py gather_lanes_*).
    """
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return lax.gather(
        x,
        idx[..., None].astype(jnp.int32),
        dnums,
        (1, 1),
        indices_are_sorted=False,
        unique_indices=False,
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
