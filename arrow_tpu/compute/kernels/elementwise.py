"""Pallas streaming elementwise kernel template with fused validity merge.

≙ one reference WGSL shader (e.g. `arithmetic/compute_shaders/f32/array.wgsl`)
PLUS its separate null-merge pass (`null_bit_buffer.rs:206-243`) in a single
VMEM round-trip: the op and the packed-word validity AND stream through the
same grid step, so nullable binary ops read each operand exactly once.

XLA's fusion produces equivalent code for simple chains; this kernel exists as
the explicit-control path (vmem budgeting, block shaping) and as the template
future custom ops plug into.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import config

LANES = 128
WORD_BITS = 32


def _pick_block_rows(rows: int) -> int:
    block_rows = min(rows, max(32, config.block_rows // LANES))
    while rows % block_rows:
        block_rows //= 2
    return max(block_rows, 1)


@functools.partial(
    jax.jit, static_argnames=("fn", "out_dtype", "interpret")
)
def binary_op_pallas(
    a: jnp.ndarray,
    b: jnp.ndarray,
    va: Optional[jnp.ndarray],
    vb: Optional[jnp.ndarray],
    fn: Callable,
    out_dtype=None,
    interpret: bool = False,
):
    """out = fn(a, b); validity = va & vb — one fused streaming kernel.

    a, b: tile-padded 1-D value buffers; va/vb: packed uint32 validity words
    (or None).  Returns (out, out_validity_or_None).
    """
    n = a.shape[0]
    assert n % (8 * LANES) == 0
    rows = n // LANES
    block_rows = _pick_block_rows(rows)
    # one word row of 128 lanes covers 128 words = 32 data rows of 128 lanes
    wrows = rows // 32
    vblock = block_rows // 32
    out_dtype = out_dtype or a.dtype
    a2, b2 = a.reshape(rows, LANES), b.reshape(rows, LANES)

    both_valid = (
        va is not None
        and vb is not None
        and wrows >= 1
        and rows % 32 == 0
        and block_rows % 32 == 0
    )

    if both_valid:
        va2 = va.reshape(wrows, LANES)
        vb2 = vb.reshape(wrows, LANES)

        def kernel(a_ref, b_ref, va_ref, vb_ref, o_ref, vo_ref):
            o_ref[...] = fn(a_ref[...], b_ref[...]).astype(o_ref.dtype)
            vo_ref[...] = va_ref[...] & vb_ref[...]

        out, vout = pl.pallas_call(
            kernel,
            grid=(rows // block_rows,),
            in_specs=[
                pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((vblock, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((vblock, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((vblock, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((rows, LANES), out_dtype),
                jax.ShapeDtypeStruct((wrows, LANES), jnp.uint32),
            ),
            interpret=interpret,
        )(a2, b2, va2, vb2)
        return out.reshape(n), vout.reshape(-1)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = fn(a_ref[...], b_ref[...]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), out_dtype),
        interpret=interpret,
    )(a2, b2)
    if va is not None and vb is not None:
        v = va & vb  # too small to fuse profitably; plain XLA AND
    else:
        v = va if vb is None else vb
    return out.reshape(n), v


@functools.partial(jax.jit, static_argnames=("fn", "out_dtype", "interpret"))
def unary_op_pallas(
    a: jnp.ndarray,
    fn: Callable,
    out_dtype=None,
    interpret: bool = False,
):
    """out = fn(a) as a streaming Pallas kernel (validity passes through)."""
    n = a.shape[0]
    assert n % (8 * LANES) == 0
    rows = n // LANES
    block_rows = _pick_block_rows(rows)
    out_dtype = out_dtype or a.dtype

    def kernel(a_ref, o_ref):
        o_ref[...] = fn(a_ref[...]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), out_dtype),
        interpret=interpret,
    )(a.reshape(rows, LANES))
    return out.reshape(n)
