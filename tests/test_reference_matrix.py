"""Reference parity matrix: every (op, dtype) combination registered in the
reference's `_dyn` dispatch macros must work here.

Combos transcribed from the reference registries:
- arithmetic `dyn_fn!` blocks (`arithmetic_kernels.rs:122-267`), neg `:343`
- compare (`compare/src/lib.rs:199-334`)
- logical (`logical/src/lib.rs:214-349`)
- cast pairs (`cast/src/lib.rs:135-161`), bitcast `:187-192`
- math (`math/src/lib.rs:261-348`)
- trigonometry (`trigonometry/src/lib.rs:163-192`)
- swizzle take/put/merge (`take.rs:85-95`, `put.rs:96-108`, `merge.rs:122-143`)
"""

import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu import kernels as K

A = at.ArrowType

_MAKE = {
    A.FLOAT32: lambda: at.Float32Array.from_slice([1.0, 2.0, 3.0]),
    A.INT32: lambda: at.Int32Array.from_slice([1, 2, 3]),
    A.DATE32: lambda: at.Date32Array.from_slice([1, 2, 3]),
    A.UINT32: lambda: at.UInt32Array.from_slice(np.array([1, 2, 3], np.uint32)),
    A.UINT16: lambda: at.UInt16Array.from_slice([1, 2, 3]),
    A.UINT8: lambda: at.UInt8Array.from_slice([1, 2, 3]),
    A.INT16: lambda: at.Int16Array.from_slice([1, 2, 3]),
    A.INT8: lambda: at.Int8Array.from_slice([1, 2, 3]),
    A.BOOL: lambda: at.BooleanArray.from_slice([True, False, True]),
}


ARITH_SCALAR = {
    "add_scalar": [A.FLOAT32, A.INT32, A.DATE32, A.UINT32, A.UINT16],
    "sub_scalar": [A.FLOAT32, A.INT32, A.UINT32],
    "mul_scalar": [A.FLOAT32, A.INT32, A.UINT32],
    "div_scalar": [A.FLOAT32, A.INT32, A.UINT32],
    "rem_scalar": [A.FLOAT32, A.INT32, A.UINT32, A.DATE32],
}

ARITH_ARRAY = {
    "add": [A.FLOAT32, A.UINT32, A.INT32, A.DATE32],
    "sub": [A.FLOAT32],
    "mul": [A.FLOAT32],
    "div": [A.FLOAT32],
}

CMP_DTYPES = [A.FLOAT32, A.UINT32, A.UINT16, A.UINT8, A.INT32, A.INT16, A.INT8, A.DATE32]
LOGICAL_DTYPES = [A.INT32, A.UINT32, A.UINT16, A.INT16, A.UINT8, A.INT8, A.BOOL]
SHIFT_DTYPES = [A.INT32, A.UINT32, A.UINT16, A.INT16, A.UINT8, A.INT8]

CAST_PAIRS = [
    (A.INT8, A.UINT8), (A.INT8, A.UINT16), (A.INT8, A.UINT32),
    (A.INT8, A.INT16), (A.INT8, A.INT32), (A.INT8, A.FLOAT32),
    (A.INT16, A.INT32), (A.INT16, A.UINT16), (A.INT16, A.UINT32),
    (A.INT16, A.FLOAT32),
    (A.UINT8, A.UINT16), (A.UINT8, A.UINT32), (A.UINT8, A.INT8),
    (A.UINT8, A.INT16), (A.UINT8, A.INT32), (A.UINT8, A.FLOAT32),
    (A.UINT16, A.UINT32), (A.UINT16, A.INT16), (A.UINT16, A.INT32),
    (A.UINT16, A.FLOAT32),
    (A.FLOAT32, A.UINT8),
    (A.BOOL, A.FLOAT32),
]

TRIG_DTYPES = [A.FLOAT32, A.UINT16, A.UINT8, A.INT16]
TAKE_DTYPES = [A.DATE32, A.UINT32, A.INT32, A.FLOAT32, A.BOOL]
PUT_DTYPES = [A.FLOAT32, A.INT32, A.UINT32, A.DATE32, A.BOOL]
MERGE_DTYPES = CMP_DTYPES + [A.BOOL]


def test_arithmetic_matrix():
    for op, dts in ARITH_SCALAR.items():
        fn = getattr(K, f"{op}_dyn")
        for d in dts:
            r = fn(_MAKE[d](), 1)
            assert len(r) == 3, (op, d)
    for op, dts in ARITH_ARRAY.items():
        fn = getattr(K, f"{op}_array_dyn")
        for d in dts:
            r = fn(_MAKE[d](), _MAKE[d]())
            assert len(r) == 3, (op, d)
    # mixed date32/i32 arms
    assert K.add_array_dyn(_MAKE[A.INT32](), _MAKE[A.DATE32]()).values() == [2, 4, 6]
    assert K.add_array_dyn(_MAKE[A.DATE32](), _MAKE[A.INT32]()).values() == [2, 4, 6]
    assert K.neg_dyn(_MAKE[A.FLOAT32]()).values() == [-1.0, -2.0, -3.0]
    for d in (A.FLOAT32, A.UINT32, A.INT32):
        assert len(K.sum_dyn(_MAKE[d]())) == 1


def test_compare_matrix():
    for op in ("eq", "gt", "gteq", "lt", "lteq"):
        fn = getattr(K, f"{op}_dyn")
        for d in CMP_DTYPES:
            r = fn(_MAKE[d](), _MAKE[d]())
            assert r.dtype is A.BOOL, (op, d)
    for op in ("min_array_dyn", "max_array_dyn"):
        fn = getattr(K, op)
        for d in CMP_DTYPES:
            assert fn(_MAKE[d](), _MAKE[d]()).dtype is d


def test_logical_matrix():
    for op in ("bitwise_and", "bitwise_or", "bitwise_xor"):
        fn = getattr(K, f"{op}_dyn")
        for d in LOGICAL_DTYPES:
            assert fn(_MAKE[d](), _MAKE[d]()).dtype is d, (op, d)
    for d in LOGICAL_DTYPES:
        assert K.bitwise_not_dyn(_MAKE[d]()).dtype is d
    amounts = at.UInt32Array.from_slice(np.array([1, 1, 1], np.uint32))
    for op in ("bitwise_shl_dyn", "bitwise_shr_dyn"):
        fn = getattr(K, op)
        for d in SHIFT_DTYPES:
            assert fn(_MAKE[d](), amounts).dtype is d, (op, d)
    b = _MAKE[A.BOOL]()
    assert K.any_(b) is True and K.all_(b) is False


def test_cast_matrix():
    for src, dst in CAST_PAIRS:
        r = K.cast_dyn(_MAKE[src](), dst)
        assert r.dtype is dst, (src, dst)
        assert len(r) == 3
    assert K.bitcast_dyn(_MAKE[A.UINT32](), A.FLOAT32).dtype is A.FLOAT32


def test_math_matrix():
    f = _MAKE[A.FLOAT32]()
    for op in ("abs", "sqrt", "cbrt", "exp", "exp2", "log", "log2"):
        assert getattr(K, f"{op}_dyn")(f).dtype is A.FLOAT32
    assert K.power_dyn(f, f).dtype is A.FLOAT32
    i = _MAKE[A.INT32]()
    assert K.power_dyn(i, i).dtype is A.INT32
    assert K.abs_dyn(i).dtype is A.INT32


def test_trig_matrix():
    for op in ("sin", "cos", "acos"):
        fn = getattr(K, f"{op}_dyn")
        for d in TRIG_DTYPES:
            assert fn(_MAKE[d]()).dtype is A.FLOAT32, (op, d)
    assert K.sinh_dyn(_MAKE[A.FLOAT32]()).dtype is A.FLOAT32


def test_swizzle_matrix():
    idx = at.UInt32Array.from_slice(np.array([2, 0], np.uint32))
    for d in TAKE_DTYPES:
        assert len(K.take_dyn(_MAKE[d](), idx)) == 2, d
    for d in PUT_DTYPES:
        src, dst = _MAKE[d](), _MAKE[d]()
        K.put_dyn(src, idx, dst, idx)
        assert len(dst) == 3, d
    m = at.BooleanArray.from_slice([True, False, True])
    for d in MERGE_DTYPES:
        assert len(K.merge_dyn(_MAKE[d](), _MAKE[d](), m)) == 3, d
