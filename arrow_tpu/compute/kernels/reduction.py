"""Pallas grid reduction: sum over a 1-D column.

TPU-native analog of the reference's multi-pass tree reduction
(`/root/reference/crates/arithmetic/src/aggregate_kernels.rs:24-52` +
`arithmetic/compute_shaders/f32/aggregate.wgsl`): where the WGSL kernel reduces
256 elements per workgroup in shared memory and the host relaunches log256(n)
passes, the TPU grid is sequential per core, so ONE kernel accumulates block
partial sums into a VMEM accumulator across grid steps — no host loop, no
atomics, one HBM read of the data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import config

LANES = 128


def _sum_kernel(x_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += jnp.sum(x_ref[...], keepdims=True).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sum_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Sum of a padded 1-D buffer (padding must be zero). Returns 0-d array."""
    n = x.shape[0]
    assert n % (8 * LANES) == 0, "buffer must be tile-padded"
    rows = n // LANES
    block_rows = min(rows, max(8, config.block_rows // LANES))
    while rows % block_rows:
        block_rows //= 2
    x2 = x.reshape(rows, LANES)
    out = pl.pallas_call(
        _sum_kernel,
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec(
                (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), x.dtype),
        interpret=interpret,
    )(x2)
    return out[0, 0]
