"""Pallas grid reduction: sum over a 1-D column.

TPU-native analog of the reference's multi-pass tree reduction
(`/root/reference/crates/arithmetic/src/aggregate_kernels.rs:24-52` +
`arithmetic/compute_shaders/f32/aggregate.wgsl`): where the WGSL kernel reduces
256 elements per workgroup in shared memory and the host relaunches log256(n)
passes, this kernel streams every block through VMEM with explicit DMAs inside
one in-kernel loop (grid-free — see compaction.py for why this environment
needs that) and keeps a per-lane vector accumulator; one final XLA reduce
collapses the (8, 128) partials.

Integer sums accumulate in the native (wrapping) dtype via slice-adds only —
full jnp reductions of ints detour through i64 converts Mosaic can't lower.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBL = 64  # rows per streamed block (8192 elements)


def _sum_kernel(nb_ref, x_hbm, acc_ref, buf, sem):
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(i, carry):
        row0 = pl.multiple_of(i * jnp.int32(SUBL), SUBL)
        rd = pltpu.make_async_copy(x_hbm.at[pl.ds(row0, SUBL), :], buf, sem)
        rd.start()
        rd.wait()
        b = buf[...]
        # pairwise slice-adds down to (8, LANES): no jnp reductions (i64-free)
        part = b
        rows = SUBL
        while rows > 8:
            half = rows // 2
            part = part[:half, :] + part[half:rows, :]
            rows = half
        acc_ref[...] += part
        return carry

    lax.fori_loop(jnp.int32(0), nb_ref[0], body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def sum_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Sum of a padded 1-D buffer (padding must be zero). Returns 0-d array."""
    n = x.shape[0]
    assert n % (SUBL * LANES) == 0, "buffer must be 8192-aligned"
    nb = n // (SUBL * LANES)
    acc = pl.pallas_call(
        _sum_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SUBL, LANES), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((8, LANES), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.full((1,), nb, jnp.int32), x.reshape(-1, LANES))
    return jnp.sum(acc, dtype=x.dtype)
