"""MXU one-hot groupby kernel vs numpy + sort-path equivalence (CPU interpret)."""
import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu.compute.hash_aggregate import hash_aggregate
from arrow_tpu.compute.kernels.groupby_mxu import SLOTS, groupby_dense_pallas

import jax.numpy as jnp


def test_kernel_exact_vs_numpy():
    rng = np.random.default_rng(0)
    n = 16384
    keys = rng.integers(0, 4096, n).astype(np.uint32)
    vals = rng.integers(0, 2**31 - 1, n).astype(np.uint32)
    cnt, tot = groupby_dense_pallas(
        jnp.asarray(keys), jnp.asarray(vals), nlimb=4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(cnt), np.bincount(keys, minlength=SLOTS))
    exp = np.zeros(SLOTS, np.int64)
    np.add.at(exp, keys, vals.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(tot), exp)


def test_public_api_matches_sort_path():
    rng = np.random.default_rng(1)
    n = 10_000
    keys = at.UInt32Array.from_slice(rng.integers(0, 1024, n).astype(np.uint32))
    vals = at.Int32Array.from_slice(rng.integers(0, 200, n).astype(np.int32))
    spec = [("s", vals, "sum"), ("c", vals, "count"), ("m", vals, "mean"), ("n", None, "count")]
    out_mxu = hash_aggregate(keys, spec, method="mxu")
    out_sort = hash_aggregate(keys, spec, method="sort")
    assert out_mxu.num_rows == out_sort.num_rows
    for col in ("key", "s", "c", "n"):
        np.testing.assert_array_equal(
            out_mxu[col].raw_values(), out_sort[col].raw_values()
        )
    np.testing.assert_allclose(
        out_mxu["m"].raw_values(), out_sort["m"].raw_values(), rtol=1e-12
    )


def test_mxu_falls_back_on_wide_keys():
    rng = np.random.default_rng(2)
    n = 8192
    keys = at.UInt32Array.from_slice(rng.integers(0, 2**30, n).astype(np.uint32))
    vals = at.Int32Array.from_slice(rng.integers(0, 100, n).astype(np.int32))
    # auto must fall back to the sort path (keys exceed the dense domain)
    out = hash_aggregate(keys, [("s", vals, "sum")], method="auto")
    ks = np.asarray(out["key"].raw_values())
    assert out.num_rows == np.unique(np.asarray(keys.raw_values())).size
    assert (np.diff(ks) > 0).all()
    with pytest.raises(Exception):
        hash_aggregate(keys, [("s", vals, "sum")], method="mxu")


def test_mxu_negative_values_fall_back():
    rng = np.random.default_rng(3)
    n = 8192
    keys = at.UInt32Array.from_slice(rng.integers(0, 64, n).astype(np.uint32))
    vals = at.Int32Array.from_slice(rng.integers(-100, 100, n).astype(np.int32))
    out = hash_aggregate(keys, [("s", vals, "sum")], method="auto")
    kn = np.asarray(keys.raw_values())
    vn = np.asarray(vals.raw_values(), dtype=np.int64)
    exp = np.zeros(64, np.int64)
    np.add.at(exp, kn, vn)
    np.testing.assert_array_equal(
        np.asarray(out["s"].raw_values(), dtype=np.int64), exp[np.unique(kn)]
    )


def test_mxu_64bit_values_fall_back_exact():
    """ADVICE r2 high: 64-bit value columns must NOT ride the MXU path (the
    kernel carries values as i32 — values >= 2^32 would silently truncate)."""
    rng = np.random.default_rng(4)
    n = 8192
    keys = at.UInt32Array.from_slice(rng.integers(0, 16, n).astype(np.uint32))
    big = rng.integers(2**33, 2**40, n).astype(np.int64)
    vals = at.Int64Array.from_slice(big)
    out = hash_aggregate(keys, [("s", vals, "sum")], method="auto")
    kn = np.asarray(keys.raw_values())
    exp = np.zeros(16, np.int64)
    np.add.at(exp, kn, big)
    np.testing.assert_array_equal(
        np.asarray(out["s"].raw_values(), dtype=np.int64), exp[np.unique(kn)]
    )


def test_mxu_padded_buffer_rows_are_zero():
    """ADVICE r2 medium: rows >= num_groups of the MXU output buffers must be
    zero (fill_value=0 in the order gather replicated slot 0 there)."""
    rng = np.random.default_rng(5)
    n = 8192
    keys = at.UInt32Array.from_slice(rng.integers(0, 7, n).astype(np.uint32))
    vals = at.Int32Array.from_slice(rng.integers(1, 100, n).astype(np.int32))
    out = hash_aggregate(keys, [("s", vals, "sum"), ("c", vals, "count")], method="mxu")
    g = out.num_rows
    for col in ("key", "s", "c"):
        buf = np.asarray(out[col].data)
        assert (buf[g:] == 0).all(), f"{col} rows >= num_groups not zeroed"


def test_mxu_key_domain_hint_skips_range_check():
    rng = np.random.default_rng(6)
    n = 8192
    keys = at.UInt32Array.from_slice(rng.integers(0, 256, n).astype(np.uint32))
    vals = at.Int32Array.from_slice(rng.integers(0, 200, n).astype(np.int32))
    out = hash_aggregate(
        keys, [("s", vals, "sum")], method="mxu", key_domain=(0, 256), value_bits=8
    )
    kn = np.asarray(keys.raw_values())
    vn = np.asarray(vals.raw_values(), dtype=np.int64)
    exp = np.zeros(256, np.int64)
    np.add.at(exp, kn, vn)
    np.testing.assert_array_equal(
        np.asarray(out["s"].raw_values(), dtype=np.int64), exp[np.unique(kn)]
    )


def test_sort_path_dense_no_padding():
    """Dense fast path (length == padded capacity, no nulls): the sort drops
    rank/validity operands; results must match the general path exactly."""
    rng = np.random.default_rng(9)
    n = 8192  # == pad_len(n)
    keys_np = rng.integers(0, 300, n).astype(np.uint32)
    vals_np = rng.integers(-50, 50, n).astype(np.int32)
    out = hash_aggregate(
        at.UInt32Array.from_slice(keys_np),
        [("s", at.Int32Array.from_slice(vals_np), "sum"), ("c", None, "count")],
        method="sort",
    )
    uk = np.unique(keys_np)
    assert out.num_rows == uk.size
    exp = np.array([vals_np[keys_np == k].sum() for k in uk], np.int64)
    np.testing.assert_array_equal(np.asarray(out["s"].raw_values(), np.int64), exp)
    np.testing.assert_array_equal(
        np.asarray(out["c"].raw_values(), np.int64), np.bincount(keys_np)[uk]
    )


def test_partition_groupby_matches_sort():
    """Dense domains beyond 4096 route through the class-partition +
    region-MXU path; exact vs the sort path (incl. padded buffers)."""
    import arrow_tpu as at
    from arrow_tpu.compute.hash_aggregate import hash_aggregate

    rng = np.random.default_rng(7)
    n = 20000  # pads to 24576: exercises the garbage-class shift
    keys = rng.integers(0, 50000, n).astype(np.uint32)
    vals = rng.integers(0, 250, n).astype(np.int32)
    ka = at.UInt32Array.from_slice(keys)
    va = at.Int32Array.from_slice(vals)
    aggs = [("s", va, "sum"), ("c", None, "count"), ("m", va, "mean")]
    got = hash_aggregate(ka, aggs, method="partition").to_pydict()
    exp = hash_aggregate(ka, aggs, method="sort").to_pydict()
    assert got["key"] == exp["key"]
    assert got["c"] == exp["c"]
    assert got["s"] == exp["s"]
    np.testing.assert_allclose(got["m"], exp["m"], rtol=1e-12)


def test_partition_groupby_skewed_classes():
    """Heavy skew: most rows in one class, many empty classes, and chunks
    spanning several classes (the kernel's per-run while loop)."""
    import arrow_tpu as at
    from arrow_tpu.compute.hash_aggregate import hash_aggregate

    rng = np.random.default_rng(8)
    n = 16384
    # ~80% of rows on 3 keys in class 0, the rest sprayed over 2^18
    hot = rng.choice([5, 77, 4000], int(n * 0.8))
    cold = rng.integers(0, 1 << 18, n - hot.shape[0])
    keys = np.concatenate([hot, cold]).astype(np.uint32)
    rng.shuffle(keys)
    vals = rng.integers(0, 200, n).astype(np.int32)
    ka = at.UInt32Array.from_slice(keys)
    va = at.Int32Array.from_slice(vals)
    aggs = [("s", va, "sum"), ("c", None, "count")]
    got = hash_aggregate(ka, aggs, method="partition", key_domain=(0, 1 << 18), value_bits=8).to_pydict()
    exp = hash_aggregate(ka, aggs, method="sort").to_pydict()
    assert got == exp
