"""Radix sort (kernels/radix.py + sort._sort_radix): exact-match vs lax.sort.

Small shapes only: on CPU the Pallas pass kernel runs interpreted and each
bit costs a full interpreter sweep — key domains are kept narrow so chains
stay short.  ≙ reference test style: real kernels on a software backend
(SURVEY.md §4, mesa lavapipe).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu.table import RecordBatch
from arrow_tpu import dtypes as dt
from arrow_tpu.compute.sort import _sort_radix, sort, sort_by_key

N = 8192


_CLS = {
    dt.ArrowType.UINT32: "UInt32Array",
    dt.ArrowType.INT32: "Int32Array",
    dt.ArrowType.UINT64: "UInt64Array",
    dt.ArrowType.FLOAT32: "Float32Array",
    dt.ArrowType.BOOL: "BooleanArray",
}


def _mk(dtype, np_vals):
    vals = np_vals.tolist() if dtype is dt.ArrowType.BOOL else np_vals
    return getattr(at, _CLS[dtype]).from_slice(vals)


def test_radix_u32_key_payload_stable():
    rng = np.random.default_rng(0)
    k = rng.integers(0, 200, N, dtype=np.uint32)
    v = np.arange(N, dtype=np.uint32)  # iota payload exposes stability
    ka, va = _mk(dt.ArrowType.UINT32, k), _mk(dt.ArrowType.UINT32, v)
    ok, ov = sort_by_key(ka, va, method="radix")
    ref = jax.lax.sort([jnp.asarray(k), jnp.asarray(v)], num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(ok.values()), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(ov.values()), np.asarray(ref[1]))


def test_radix_u32_descending():
    rng = np.random.default_rng(1)
    k = rng.integers(0, 100, N, dtype=np.uint32)
    ka = _mk(dt.ArrowType.UINT32, k)
    ok = sort(ka, descending=True, method="radix")
    np.testing.assert_array_equal(
        np.asarray(ok.values()), np.sort(k, kind="stable")[::-1]
    )


def test_radix_u64_two_limb_chain():
    rng = np.random.default_rng(2)
    lo = rng.integers(0, 16, N, dtype=np.uint64)
    hi = rng.integers(0, 8, N, dtype=np.uint64)
    k = (hi << np.uint64(32)) | lo
    v = np.arange(N, dtype=np.uint32)
    ka, va = _mk(dt.ArrowType.UINT64, k), _mk(dt.ArrowType.UINT32, v)
    ok, ov = sort_by_key(ka, va, method="radix")
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok.values()), k[order])
    np.testing.assert_array_equal(np.asarray(ov.values()), v[order])


def test_radix_padding_rows_stay_out():
    # length < padded buffer: padding must neither pollute the output nor
    # break the zero-tail invariant
    rng = np.random.default_rng(3)
    length = N - 700
    k = rng.integers(0, 64, length, dtype=np.uint32)
    ka = _mk(dt.ArrowType.UINT32, k)
    assert ka.data.shape[0] == N
    ok = sort(ka, method="radix")
    assert len(ok) == length
    np.testing.assert_array_equal(np.asarray(ok.values()), np.sort(k, kind="stable"))
    # zero-padding invariant on the raw buffer
    np.testing.assert_array_equal(np.asarray(ok.data[length:]), 0)


def test_radix_w64_payload_and_bool_payload():
    rng = np.random.default_rng(4)
    k = rng.integers(0, 32, N, dtype=np.uint32)
    v64 = rng.integers(0, 1 << 40, N, dtype=np.uint64)
    vb = rng.integers(0, 2, N).astype(bool)
    ka = _mk(dt.ArrowType.UINT32, k)
    p = RecordBatch(
        {
            "v": _mk(dt.ArrowType.UINT64, v64),
            "b": _mk(dt.ArrowType.BOOL, vb),
        }
    )
    ok, op = sort_by_key(ka, p, method="radix")
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok.values()), k[order])
    np.testing.assert_array_equal(np.asarray(op["v"].values()), v64[order])
    np.testing.assert_array_equal(np.asarray(op["b"].values()), vb[order])


def test_radix_i32_and_f32_small_domains():
    # two's-complement / float encodings flip high bits, so chains run long;
    # use tiny n to keep the interpreter fast
    n = 8192
    rng = np.random.default_rng(5)
    ki = rng.integers(-3, 3, n).astype(np.int32)
    ka = _mk(dt.ArrowType.INT32, ki)
    ok = sort(ka, method="radix")
    np.testing.assert_array_equal(np.asarray(ok.values()), np.sort(ki, kind="stable"))

    kf = rng.choice(
        np.array([-2.5, -0.0, 0.0, 1.5, np.inf, -np.inf, np.nan], np.float32), n
    )
    kfa = _mk(dt.ArrowType.FLOAT32, kf)
    okf, _ = _sort_radix(kfa, [])
    got = np.asarray(okf.values())
    ref = np.asarray(
        jax.lax.sort([jnp.asarray(kf)], num_keys=1, is_stable=True)[0]
    )
    np.testing.assert_array_equal(
        got[~np.isnan(got)], ref[~np.isnan(ref)]
    )
    assert np.isnan(got[-np.isnan(got).sum() :]).all()


def test_radix_method_rejects_nullable():
    k = at.UInt32Array.from_optional_slice([1, None, 3] + [0] * 100)
    with pytest.raises(Exception):
        sort(k, method="radix")


def test_radix_groupby_matches_sort_path(monkeypatch):
    from arrow_tpu.compute.hash_aggregate import hash_aggregate

    monkeypatch.setenv("ARROW_TPU_FORCE_RADIX_AGG", "1")
    rng = np.random.default_rng(7)
    k = rng.integers(0, 50, N, dtype=np.uint32)
    v = rng.integers(0, 1000, N).astype(np.int32)
    ka = _mk(dt.ArrowType.UINT32, k)
    va = getattr(at, "Int32Array").from_slice(v)
    out = hash_aggregate(ka, [("s", va, "sum"), ("c", va, "count")], method="radix")
    monkeypatch.delenv("ARROW_TPU_FORCE_RADIX_AGG")
    ref = hash_aggregate(ka, [("s", va, "sum"), ("c", va, "count")], method="sort")
    np.testing.assert_array_equal(
        np.asarray(out["key"].values()), np.asarray(ref["key"].values())
    )
    np.testing.assert_array_equal(
        np.asarray(out["s"].values()), np.asarray(ref["s"].values())
    )
    np.testing.assert_array_equal(
        np.asarray(out["c"].values()), np.asarray(ref["c"].values())
    )


def test_radix_4way_kernel_matches(monkeypatch):
    # the 2-bit/4-stream pass kernel (opt-in: slower per bit on v5e but kept
    # as a measured alternative) must agree with the default 2-stream chain
    monkeypatch.setenv("ARROW_TPU_RADIX_R", "4")
    rng = np.random.default_rng(11)
    k = rng.integers(0, 300, N, dtype=np.uint32)
    v = np.arange(N, dtype=np.uint32)
    ka, va = _mk(dt.ArrowType.UINT32, k), _mk(dt.ArrowType.UINT32, v)
    ok, ov = sort_by_key(ka, va, method="radix")
    monkeypatch.delenv("ARROW_TPU_RADIX_R")
    ref = jax.lax.sort([jnp.asarray(k), jnp.asarray(v)], num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(ok.values()), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(ov.values()), np.asarray(ref[1]))
