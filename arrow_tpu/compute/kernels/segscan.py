"""Pallas single-pass (segmented) scan kernel with cross-block carry.

Replaces the Hillis-Steele log-shift ladders of `utils.scans` on the hot
paths: a 16M-row segmented scan as an XLA ladder is log2(n)=24 full HBM
elementwise passes (~several GB of traffic); this kernel streams the data
through VMEM ONCE (read values + flags, write values) and runs the log-shift
ladder on the VMEM-resident block, carrying the running aggregate across
blocks through the sequential in-kernel loop — the TPU grid's sequential
execution IS the scan's serial dependency, for free.

Supports:
  - segmented or plain inclusive scans (flags=None);
  - any associative combine over N same-dtype planes (64-bit sums ride as
    two u32 limb planes with a bit-trick carry — i64 vectors don't exist
    in-kernel, see compaction.py's Mosaic notes);
  - noncommutative combines (segment-broadcast-first is combine=lambda a,b: a)
    — the ladder and the carry both compose strictly older-first.

Semantics (flat order, inclusive):
  out[i] = vals[i]                     if flags[i] or i == 0
           combine(out[i-1], vals[i])  otherwise

≙ reference seed: the multi-pass tree reduction
`/root/reference/crates/arithmetic/src/aggregate_kernels.rs:24-52` — its
"re-launch until converged" host loop becomes one in-kernel sequential DMA
loop; the workgroup shared-memory tree becomes the VMEM-resident ladder.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compaction import _flat_roll_right

LANES = 128
MAX_BLOCK = 32768


def _pick_block(n: int) -> int:
    block = MAX_BLOCK
    while n % block:
        block //= 2
    assert block >= 8192, f"n must be a multiple of 8192, got {n}"
    return block


def _make_kernel(nplanes: int, block: int, combine, has_flags: bool):
    subl = block // LANES
    nstages = block.bit_length() - 1  # d = 1, 2, ..., block/2

    def _lane_bcast_last(row):
        # Fill all lanes of a (1, LANES) row with its lane-127 value using a
        # doubling roll ladder — Mosaic can't lower a (1,1)->(r,LANES)
        # vector.broadcast ("Broadcast in both sublanes and lanes"), and XLA
        # folds chained single-axis broadcasts back into one.
        r = jnp.roll(row, 1, axis=1)  # lane 0 <- lane 127
        col = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        k = 1
        while k < LANES:
            r = jnp.where(col < k, r, jnp.roll(r, k, axis=1))
            k <<= 1
        return r

    def kernel(nb_ref, *refs):
        k = 0
        ins = refs[k : k + nplanes]
        k += nplanes
        if has_flags:
            flag_hbm = refs[k]
            k += 1
        outs = refs[k : k + nplanes]
        k += nplanes
        vbufs = refs[k : k + nplanes]
        k += nplanes
        if has_flags:
            fbuf = refs[k]
            k += 1
        carry = refs[k]
        sem_r = refs[k + 1]
        sem_w = refs[k + 2]

        ii = lax.broadcasted_iota
        idxf = ii(jnp.int32, (subl, LANES), 0) * LANES + ii(
            jnp.int32, (subl, LANES), 1
        )

        def body(i, _):
            row0 = pl.multiple_of(i * jnp.int32(subl), subl)
            rds = [
                pltpu.make_async_copy(
                    ins[p].at[pl.ds(row0, subl), :], vbufs[p], sem_r.at[jnp.int32(p)]
                )
                for p in range(nplanes)
            ]
            for r in rds:
                r.start()
            if has_flags:
                rf = pltpu.make_async_copy(
                    flag_hbm.at[pl.ds(row0, subl), :], fbuf, sem_r.at[jnp.int32(nplanes)]
                )
                rf.start()
            for r in rds:
                r.wait()
            v = tuple(vbufs[p][...] for p in range(nplanes))
            if has_flags:
                rf.wait()
                f = fbuf[...]

            # VMEM-resident log-shift segmented scan of the block
            for s in range(nstages):
                d = 1 << s
                pv = tuple(_flat_roll_right(p, d) for p in v)
                has_pred = idxf >= d
                if has_flags:
                    take = has_pred & (f == 0)
                    pf = _flat_roll_right(f, d)
                    f = f | jnp.where(has_pred, pf, jnp.zeros_like(f))
                else:
                    take = has_pred
                cv = combine(pv, v)
                v = tuple(
                    jnp.where(take, cv[p], v[p]) for p in range(nplanes)
                )

            # fold in the previous block's running aggregate (rows before the
            # block's first segment start continue the previous segment)
            cplanes = tuple(
                jnp.broadcast_to(carry[p, 0:1, :], (subl, LANES))
                for p in range(nplanes)
            )
            # scalar-predicate selects on the loop index are miscompiled in
            # a pallas fori body — broadcast i into a plane via arithmetic
            not_first_block = (jnp.zeros((subl, LANES), jnp.int32) + i) > 0
            cont = ((f == 0) if has_flags else (idxf >= 0)) & not_first_block
            cc = combine(cplanes, v)
            v = tuple(
                jnp.where(cont, cc[p], v[p]) for p in range(nplanes)
            )

            for p in range(nplanes):
                carry[p, :, :] = jnp.broadcast_to(
                    _lane_bcast_last(v[p][subl - 1 : subl, :]), (8, LANES)
                )

            for p in range(nplanes):
                vbufs[p][...] = v[p]
                wr = pltpu.make_async_copy(
                    vbufs[p], outs[p].at[pl.ds(row0, subl), :], sem_w.at[jnp.int32(p)]
                )
                wr.start()
                wr.wait()
            return _

        lax.fori_loop(jnp.int32(0), nb_ref[0], body, jnp.int32(0))

    return kernel, subl


@functools.partial(
    jax.jit, static_argnames=("combine", "has_flags", "interpret")
)
def _segscan_call(planes, flags_i32, combine, has_flags, interpret):
    n = planes[0].shape[0]
    nplanes = len(planes)
    dtype = planes[0].dtype
    block = _pick_block(n)
    nb = n // block
    kernel, subl = _make_kernel(nplanes, block, combine, has_flags)

    scratch = [pltpu.VMEM((subl, LANES), dtype) for _ in range(nplanes)]
    if has_flags:
        scratch.append(pltpu.VMEM((subl, LANES), jnp.int32))
    scratch += [
        pltpu.VMEM((nplanes, 8, LANES), dtype),
        pltpu.SemaphoreType.DMA((nplanes + 1,)),
        pltpu.SemaphoreType.DMA((nplanes,)),
    ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
        pl.BlockSpec(memory_space=pl.ANY)
    ] * (nplanes + (1 if has_flags else 0))
    args = [jnp.full((1,), nb, jnp.int32)]
    args += [p.reshape(-1, LANES) for p in planes]
    if has_flags:
        args.append(flags_i32.reshape(-1, LANES))
    outs = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nplanes,
        scratch_shapes=scratch,
        out_shape=[
            jax.ShapeDtypeStruct((n // LANES, LANES), dtype)
            for _ in range(nplanes)
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*args)
    return tuple(o.reshape(-1) for o in outs)


def segscan_pallas(planes, flags, combine, interpret: bool = False):
    """Inclusive (segmented) scan over same-dtype 1-D planes.

    planes: tuple of (n,) arrays, n % 8192 == 0, identical dtypes;
    flags: (n,) bool/int segment-start flags, or None for a plain scan;
    combine: tuple x tuple -> tuple, associative, older operand first.
    Returns the scanned planes (tuple).
    """
    planes = tuple(planes)
    has_flags = flags is not None
    f = flags.astype(jnp.int32) if has_flags else None
    return _segscan_call(planes, f, combine, has_flags, interpret)


# ---- combines ---------------------------------------------------------------


def combine_add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def combine_add64(a, b):
    """Exact 64-bit add over (lo, hi) u32 limb planes.

    Carry via the bitwise identity carry_out(x+y) = MSB((x&y) | ((x|y)&~s))
    — no unsigned vector compares, no i64 vectors (Mosaic-safe).
    """
    al, ah = a
    bl, bh = b
    lo = al + bl
    cr = ((al & bl) | ((al | bl) & ~lo)) >> 31
    return lo, ah + bh + cr


def combine_max(a, b):
    return tuple(jnp.maximum(x, y) for x, y in zip(a, b))


def combine_min(a, b):
    return tuple(jnp.minimum(x, y) for x, y in zip(a, b))


def combine_first(a, b):
    return a


_COMBINES = {
    "add": combine_add,
    "add64": combine_add64,
    "max": combine_max,
    "min": combine_min,
    "first": combine_first,
}


def scan_supported(vals: jnp.ndarray, op: str) -> bool:
    """Whether the Pallas path can run this scan on the current backend."""
    if jax.default_backend() != "tpu":
        return False
    n = vals.shape[0]
    if n % 8192 != 0 or n < 8192:
        return False
    if op not in ("add", "max", "min", "first"):
        return False
    dt_ = vals.dtype
    if dt_ in (jnp.int64, jnp.uint64):
        return op in ("add", "first")  # limb decomposition paths
    return dt_ in (jnp.int32, jnp.uint32, jnp.float32)


def segmented_scan_pallas(vals, starts, op: str, interpret: bool = False):
    """Dispatch wrapper: 64-bit ints ride as u32 limb pairs."""
    if vals.dtype in (jnp.int64, jnp.uint64):
        limbs = lax.bitcast_convert_type(vals, jnp.uint32)
        lo, hi = limbs[..., 0], limbs[..., 1]
        comb = combine_add64 if op == "add" else combine_first
        slo, shi = segscan_pallas((lo, hi), starts, comb, interpret)
        return lax.bitcast_convert_type(
            jnp.stack([slo, shi], axis=-1), vals.dtype
        )
    (out,) = segscan_pallas((vals,), starts, _COMBINES[op], interpret)
    return out
