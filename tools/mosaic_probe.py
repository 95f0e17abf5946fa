"""Empirical capability probe of the tunneled TPU's Mosaic compiler.

Round 1 found this environment's remote Mosaic rejects gridded pallas_call,
pltpu.roll, i64 converts, i1/i8 vector truncations (see compaction.py header).
This probe re-checks those and tests the primitives the round-2 radix
partition / hash-agg / join kernels want: dynamic lane gather
(take_along_axis), int8 MXU matmul, sub-8-row dynamic-offset DMA, in-VMEM
dynamic slices, cumsum. Run: python tools/mosaic_probe.py [--quick]

Results go to stdout; the standing capability matrix lives in
docs/mosaic_notes.md.

The probe runs in the LIBRARY's numerics environment (importing arrow_tpu
turns x64 on): round 2 probed with x64 off and concluded pltpu.roll compiled,
but under x64 the Python-int shift reached Mosaic as i64 and crashed every
kernel on the chip — probe conclusions are only valid in the environment the
kernels actually run in (VERDICT r2 weak #3).
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import arrow_tpu  # noqa: F401  (x64 + compile cache: the library's env)
import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESULTS = []


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                RESULTS.append((name, "OK", ""))
                print(f"[OK]   {name}", flush=True)
            except Exception as e:  # noqa: BLE001
                msg = str(e).split("\n")[0][:160]
                RESULTS.append((name, "FAIL", msg))
                print(f"[FAIL] {name}: {msg}", flush=True)
        run.__name__ = name
        return run
    return deco


def simple_call(kernel, out_shape, *args, scratch_shapes=(), in_smem=0, grid=None):
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(in_smem)] + [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args[in_smem:]
    ]
    kw = {}
    if grid is not None:
        kw["grid"] = grid
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch_shapes),
        **kw,
    )(*args)


@probe("grid_1d_blockspec")
def p_grid():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1

    x = jnp.arange(4 * 64 * 128, dtype=jnp.int32).reshape(4 * 64, 128)
    out = pl.pallas_call(
        k,
        grid=(4,),
        in_specs=[pl.BlockSpec((64, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * 64, 128), jnp.int32),
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x) + 1)


@probe("gather_lanes_taa_8x128_i32")
def p_taa_lane():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)), dtype=jnp.int32)
    out = simple_call(k, jax.ShapeDtypeStruct((8, 128), jnp.int32), x, idx)
    np.testing.assert_array_equal(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(idx), 1))


@probe("gather_lanes_taa_256x128_i32")
def p_taa_lane_big():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    x = jnp.arange(256 * 128, dtype=jnp.int32).reshape(256, 128)
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, 128, (256, 128)), dtype=jnp.int32)
    out = simple_call(k, jax.ShapeDtypeStruct((256, 128), jnp.int32), x, idx)
    np.testing.assert_array_equal(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(idx), 1))


@probe("gather_sublanes_taa_axis0")
def p_taa_sublane():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    x = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    rng = np.random.default_rng(2)
    idx = jnp.asarray(rng.integers(0, 64, (64, 128)), dtype=jnp.int32)
    out = simple_call(k, jax.ShapeDtypeStruct((64, 128), jnp.int32), x, idx)
    np.testing.assert_array_equal(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(idx), 0))


@probe("gather_lanes_f32")
def p_taa_lane_f32():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    rng = np.random.default_rng(3)
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)), dtype=jnp.int32)
    out = simple_call(k, jax.ShapeDtypeStruct((8, 128), jnp.float32), x, idx)
    np.testing.assert_array_equal(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(idx), 1))


@probe("matmul_int8_s32acc")
def p_int8_mm():
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.integers(-100, 100, (128, 128)), dtype=jnp.int8)
    b = jnp.asarray(rng.integers(-100, 100, (128, 128)), dtype=jnp.int8)
    out = simple_call(k, jax.ShapeDtypeStruct((128, 128), jnp.int32), a, b)
    exp = np.asarray(a, np.int32) @ np.asarray(b, np.int32)
    np.testing.assert_array_equal(np.asarray(out), exp)


@probe("cmp_to_int8_vector")
def p_i8_trunc():
    def k(a_ref, o_ref):
        o_ref[:] = (a_ref[:] > 50).astype(jnp.int8)

    a = jnp.arange(32 * 128, dtype=jnp.int32).reshape(32, 128) % 100
    out = simple_call(k, jax.ShapeDtypeStruct((32, 128), jnp.int8), a)
    np.testing.assert_array_equal(np.asarray(out), (np.asarray(a) > 50).astype(np.int8))


@probe("cmp_to_bf16_vector")
def p_bf16_onehot():
    def k(a_ref, o_ref):
        o_ref[:] = (a_ref[:] > 50).astype(jnp.bfloat16)

    a = jnp.arange(32 * 128, dtype=jnp.int32).reshape(32, 128) % 100
    out = simple_call(k, jax.ShapeDtypeStruct((32, 128), jnp.bfloat16), a)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), (np.asarray(a) > 50).astype(np.float32)
    )


@probe("pltpu_roll_static")
def p_roll_static():
    def k(a_ref, o_ref):
        o_ref[:] = pltpu.roll(a_ref[:], 3, 1)

    a = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    out = simple_call(k, jax.ShapeDtypeStruct((8, 128), jnp.int32), a)
    np.testing.assert_array_equal(np.asarray(out), np.roll(np.asarray(a), 3, 1))


@probe("pltpu_roll_dynamic")
def p_roll_dyn():
    def k(s_ref, a_ref, o_ref):
        o_ref[:] = pltpu.roll(a_ref[:], s_ref[0], 1)

    a = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    s = jnp.full((1,), 5, jnp.int32)
    out = simple_call(k, jax.ShapeDtypeStruct((8, 128), jnp.int32), s, a, in_smem=1)
    np.testing.assert_array_equal(np.asarray(out), np.roll(np.asarray(a), 5, 1))


@probe("dynamic_slice_vmem_rows")
def p_dynslice():
    def k(s_ref, a_ref, o_ref):
        o_ref[:] = a_ref[pl.ds(s_ref[0], 8), :]

    a = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    s = jnp.full((1,), 21, jnp.int32)  # deliberately not multiple of 8
    out = simple_call(k, jax.ShapeDtypeStruct((8, 128), jnp.int32), s, a, in_smem=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(a)[21:29])


@probe("dynamic_store_vmem_rows")
def p_dynstore():
    def k(s_ref, a_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[pl.ds(s_ref[0], 8), :] = a_ref[:]

    a = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    s = jnp.full((1,), 13, jnp.int32)
    out = simple_call(k, jax.ShapeDtypeStruct((64, 128), jnp.int32), s, a, in_smem=1)
    exp = np.zeros((64, 128), np.int32)
    exp[13:21] = np.asarray(a)
    np.testing.assert_array_equal(np.asarray(out), exp)


@probe("dma_unaligned_row_offset")
def p_dma_rowoff():
    # HBM->VMEM DMA whose source offset is a row (128 elems), not a tile (1024)
    def k(s_ref, src, o_ref, buf, sem):
        off = s_ref[0]
        cp = pltpu.make_async_copy(src.at[pl.ds(off, 8), :], buf, sem)
        cp.start()
        cp.wait()
        o_ref[:] = buf[:]

    src = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    s = jnp.full((1,), 3, jnp.int32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32), pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(s, src)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src)[3:11])


@probe("dma_unaligned_row_write")
def p_dma_rowoff_w():
    # VMEM->HBM DMA whose dest offset is a row (128 elems), not a tile
    def k(s_ref, src_ref, out_hbm, sem):
        cp = pltpu.make_async_copy(src_ref, out_hbm.at[pl.ds(s_ref[0], 8), :], sem)
        cp.start()
        cp.wait()

    src = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    s = jnp.full((1,), 5, jnp.int32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(s, src)
    np.testing.assert_array_equal(np.asarray(out)[5:13], np.asarray(src))


@probe("dma_dynamic_size_rows")
def p_dma_dynsize():
    # DMA with a *data-dependent* number of rows: expected unsupported (shapes
    # must be static); probe to confirm.
    def k(s_ref, src, o_ref, buf, sem):
        nrows = s_ref[0]
        cp = pltpu.make_async_copy(src.at[pl.ds(0, nrows), :], buf.at[pl.ds(0, nrows), :], sem)
        cp.start()
        cp.wait()
        o_ref[:] = buf[:]

    src = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    s = jnp.full((1,), 8, jnp.int32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((64, 128), jnp.int32), pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(s, src)
    np.testing.assert_array_equal(np.asarray(out)[:8], np.asarray(src)[:8])


@probe("cumsum_lanes_i32")
def p_cumsum_lane():
    def k(a_ref, o_ref):
        o_ref[:] = jnp.cumsum(a_ref[:], axis=1)

    a = jnp.ones((8, 128), jnp.int32)
    out = simple_call(k, jax.ShapeDtypeStruct((8, 128), jnp.int32), a)
    np.testing.assert_array_equal(np.asarray(out), np.cumsum(np.ones((8, 128), np.int32), 1))


@probe("cumsum_sublanes_f32")
def p_cumsum_sub():
    def k(a_ref, o_ref):
        o_ref[:] = jnp.cumsum(a_ref[:], axis=0)

    a = jnp.ones((64, 128), jnp.float32)
    out = simple_call(k, jax.ShapeDtypeStruct((64, 128), jnp.float32), a)
    np.testing.assert_array_equal(np.asarray(out), np.cumsum(np.ones((64, 128), np.float32), 0))


@probe("lax_sort_in_kernel")
def p_sort():
    def k(a_ref, o_ref):
        o_ref[:] = jax.lax.sort(a_ref[:], dimension=1)

    a = jnp.asarray(np.random.default_rng(5).integers(0, 1000, (8, 128)), jnp.int32)
    out = simple_call(k, jax.ShapeDtypeStruct((8, 128), jnp.int32), a)
    np.testing.assert_array_equal(np.asarray(out), np.sort(np.asarray(a), 1))


@probe("transpose_32b_128x128")
def p_transpose():
    def k(a_ref, o_ref):
        o_ref[:] = a_ref[:].T

    a = jnp.arange(128 * 128, dtype=jnp.int32).reshape(128, 128)
    out = simple_call(k, jax.ShapeDtypeStruct((128, 128), jnp.int32), a)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(a).T)


@probe("u32_shifts_popcount")
def p_u32():
    def k(a_ref, o_ref):
        x = a_ref[:]
        o_ref[:] = (x >> 3) ^ (x << 2) ^ lax.population_count(x)

    a = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
    xn = np.arange(8 * 128, dtype=np.uint32).reshape(8, 128)
    exp = (xn >> 3) ^ (xn << np.uint32(2)) ^ np.vectorize(lambda v: bin(v).count("1"))(xn).astype(np.uint32)
    out = simple_call(k, jax.ShapeDtypeStruct((8, 128), jnp.uint32), a)
    np.testing.assert_array_equal(np.asarray(out), exp)


@probe("smem_scratch_scalar_loop")
def p_smem():
    def k(a_ref, o_ref, s):
        s[0] = jnp.int32(0)

        def body(i, _):
            s[0] = s[0] + a_ref[i, 0]
            return 0

        lax.fori_loop(jnp.int32(0), jnp.int32(8), body, jnp.int32(0))
        o_ref[:] = jnp.zeros_like(o_ref) + s[0]

    a = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    out = simple_call(
        k, jax.ShapeDtypeStruct((8, 128), jnp.int32), a,
        scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
    )
    exp = sum(int(i * 128) for i in range(8))
    assert int(np.asarray(out)[0, 0]) == exp, (np.asarray(out)[0, 0], exp)


@probe("bitcast_f32_u32")
def p_bitcast():
    def k(a_ref, o_ref):
        o_ref[:] = pltpu.bitcast(a_ref[:], jnp.uint32)

    a = jnp.ones((8, 128), jnp.float32)
    out = simple_call(k, jax.ShapeDtypeStruct((8, 128), jnp.uint32), a)
    np.testing.assert_array_equal(np.asarray(out), np.full((8, 128), 0x3F800000, np.uint32))


@probe("hbm_to_hbm_dma")
def p_hbm_hbm():
    def k(src, o_hbm, sem):
        cp = pltpu.make_async_copy(src.at[pl.ds(8, 8), :], o_hbm.at[pl.ds(0, 8), :], sem)
        cp.start()
        cp.wait()

    src = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src)[8:16])


@probe("gather_lanes_256wide_2gathers")
def p_gather_256():
    # 256-entry table lookup: two 128-lane gathers + select on the high bit
    def k(t_ref, i_ref, o_ref):
        idx = i_ref[:]
        lo = jnp.take_along_axis(t_ref[:, :128], jnp.minimum(idx, 127), axis=1)
        hi = jnp.take_along_axis(t_ref[:, 128:], jnp.maximum(idx - 128, 0), axis=1)
        o_ref[:] = jnp.where(idx < 128, lo, hi)

    t = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)
    rng = np.random.default_rng(7)
    idx = jnp.asarray(rng.integers(0, 256, (8, 128)), dtype=jnp.int32)
    out = simple_call(k, jax.ShapeDtypeStruct((8, 128), jnp.int32), t, idx)
    np.testing.assert_array_equal(
        np.asarray(out), np.take_along_axis(np.asarray(t), np.asarray(idx), 1)
    )


@probe("prefetch_scalar_grid")
def p_prefetch():
    def k(s_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] + s_ref[0]

    x = jnp.arange(2 * 8 * 128, dtype=jnp.int32).reshape(16, 128)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2,),
        in_specs=[pl.BlockSpec((8, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32), grid_spec=gs)(
        jnp.full((1,), 7, jnp.int32), x
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x) + 7)


ALL = [v for name, v in sorted(globals().items()) if name.startswith("p_")]

# the capability probes that caused (or guard against) real shipped bugs.
# Substrings match @probe LABELS (the decorator sets fn.__name__ to the
# label): roll (the r2 fleet crash class), gridded pallas_call, weak-int
# loop carries, take_along_axis lowering, int8 compares/matmuls.
QUICK = ("roll", "grid", "smem_scratch", "gather_lanes_taa_8", "int8")

if __name__ == "__main__":
    print(f"jax {jax.__version__}, devices: {jax.devices()}", flush=True)
    arg = sys.argv[1] if len(sys.argv) > 1 else None
    for fn in ALL:
        if arg == "--quick":
            if not any(q in fn.__name__ for q in QUICK):
                continue
        elif arg and arg not in fn.__name__:
            continue
        fn()
    print("\n=== MATRIX ===")
    for name, status, msg in RESULTS:
        print(f"{status:5s} {name} {msg}")
