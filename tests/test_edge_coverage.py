"""Edge coverage beyond the core suites: sub-32-bit arithmetic, remaining cast
pairs, swizzle dtypes the reference left todo!(), scale tests.

≙ the reference's per-crate edge tests (u32 wraparound `arithmetic/src/u32.rs`,
10M-element adds `arithmetic/src/f32.rs:189-207`, 4M sums `:279-289`)."""

import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu import kernels as K
from arrow_tpu import compute as C

from helpers import assert_values_eq


def test_u16_arithmetic_wrapping():
    a = at.UInt16Array.from_slice([65535, 1, 30000])
    r = K.add_scalar(a, 2)
    assert r.values() == [1, 3, 30002]
    b = at.UInt16Array.from_slice([2, 65535, 40000])
    assert K.add(a, b).values() == [(65535 + 2) % 65536, 0, (70000) % 65536]
    assert K.mul(a, b).values() == [(65535 * 2) % 65536, 65535, (30000 * 40000) % 65536]


def test_u8_i8_arithmetic():
    a = at.UInt8Array.from_slice([255, 1, 128])
    assert K.add_scalar(a, 1).values() == [0, 2, 129]
    i = at.Int8Array.from_slice([127, -128, -1])
    assert K.add_scalar(i, 1).values() == [-128, -127, 0]
    assert K.sub(i, at.Int8Array.from_slice([1, 1, 1])).values() == [126, 127, -2]


def test_i16_div_rem_by_zero():
    a = at.Int16Array.from_slice([-32768, 7, -9])
    b = at.Int16Array.from_slice([-1, 0, 2])
    assert K.div(a, b).values() == [-32768, 7, -4]  # WGSL defined results
    assert K.rem(a, b).values() == [0, 0, -1]


def test_take_sub32_dtypes():
    """The reference's u8/u16 take shaders are todo!() stubs (routines/src/u8.rs);
    we implement them."""
    idx = at.UInt32Array.from_slice(np.array([2, 0, 1], np.uint32))
    u8 = at.UInt8Array.from_optional_slice([10, None, 30])
    assert K.take(u8, idx).values() == [30, 10, None]
    u16 = at.UInt16Array.from_slice([100, 200, 300])
    assert K.take(u16, idx).values() == [300, 100, 200]
    i64 = at.Int64Array.from_slice([-1, -2, -3])
    assert K.take(i64, idx).values() == [-3, -1, -2]


def test_put_sub32_dtypes():
    src = at.UInt16Array.from_slice([7, 9])
    dst = at.UInt16Array.from_slice([0, 0, 0])
    K.put(src, at.UInt32Array.from_slice(np.array([0, 1], np.uint32)),
          dst, at.UInt32Array.from_slice(np.array([2, 0], np.uint32)))
    assert dst.values() == [9, 0, 7]


def test_merge_all_dtypes():
    m = at.BooleanArray.from_slice([True, False])
    for cls, a_vals, b_vals in [
        (at.UInt8Array, [1, 2], [10, 20]),
        (at.Int16Array, [-1, -2], [-10, -20]),
        (at.UInt64Array, [1, 2], [10, 20]),
        (at.Float64Array, [1.5, 2.5], [10.5, 20.5]),
    ]:
        r = K.merge(cls.from_slice(a_vals), cls.from_slice(b_vals), m)
        assert r.values() == [a_vals[0], b_vals[1]], cls.__name__


def test_cast_closure_extensions():
    a = at.Int32Array.from_slice([-1, 1000, 70000])
    assert K.cast(a, at.ArrowType.INT16).values() == [-1, 1000, 4464]  # 70000 mod 2^16
    assert K.cast(a, at.ArrowType.UINT8).values() == [255, 232, 112]
    assert K.cast(a, at.ArrowType.INT64).values() == [-1, 1000, 70000]
    assert K.cast(a, at.ArrowType.FLOAT64).values() == [-1.0, 1000.0, 70000.0]
    b = at.BooleanArray.from_slice([True, False, True])
    assert K.cast(b, at.ArrowType.INT32).values() == [1, 0, 1]
    assert K.cast(b, at.ArrowType.UINT8).values() == [1, 0, 1]


def test_bitcast_same_width_family():
    f = at.Float32Array.from_slice([1.0, -2.0])
    assert K.bitcast(f, at.ArrowType.INT32).values() == [0x3F800000, -0x40000000]
    i64 = at.Int64Array.from_slice([4607182418800017408])  # bits of 1.0 f64
    assert K.bitcast(i64, at.ArrowType.FLOAT64).values() == [1.0]
    i16 = at.Int16Array.from_slice([-1])
    assert K.bitcast(i16, at.ArrowType.UINT16).values() == [65535]


def test_scale_10m_add():
    n = 10_000_000
    a = at.Float32Array.from_slice(np.full(n, 1.5, np.float32))
    r = K.add_scalar(a, 2.5)
    raw = r.raw_values()
    assert raw[0] == 4.0 and raw[-1] == 4.0
    assert len(r) == n


def test_scale_filter_1m_extreme_selectivity():
    n = 1 << 20
    x = at.Int32Array.from_slice(np.arange(n, dtype=np.int32))
    none = at.BooleanArray.from_slice(np.zeros(n, bool))
    allm = at.BooleanArray.from_slice(np.ones(n, bool))
    assert len(C.filter(x, none)) == 0
    out = C.filter(x, allm)
    assert len(out) == n
    got = out.raw_values()
    assert got[0] == 0 and got[-1] == n - 1


def test_sort_empty_and_single():
    e = at.Int32Array.from_slice(np.array([], np.int32))
    assert C.sort(e).values() == []
    s = at.Int32Array.from_slice([42])
    assert C.sort(s).values() == [42]


def test_aggregate_single_group_and_all_null():
    k = at.UInt32Array.from_slice(np.full(100, 7, np.uint32))
    v = at.Int32Array.from_slice(np.ones(100, np.int32))
    out = C.hash_aggregate(k, [("s", v, "sum")])
    assert out["key"].values() == [7] and out["s"].values() == [100]
    nk = at.UInt32Array.from_optional_slice([None, None])
    out2 = C.hash_aggregate(nk, [("c", None, "count")])
    assert out2.num_rows == 0


def test_join_empty_sides():
    e = at.UInt32Array.from_slice(np.array([], np.uint32))
    x = at.UInt32Array.from_slice(np.array([1, 2], np.uint32))
    _, _, t = C.join_indices(e, x)
    assert t == 0
    _, _, t2 = C.join_indices(x, e)
    assert t2 == 0
