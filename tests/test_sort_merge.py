"""Pallas merge-sort path wired through the public sort API (CPU interpret).

VERDICT r2 missing #2: `kernels/merge.py` had zero callers and zero tests.
These drive `sort(..., method="merge")` / `sort_by_key(..., method="merge")`
against stable-argsort oracles, covering duplicate-key stability, payload
integrity across plane encodings (u32/i64/bool/nullable/small dtypes), runt
logical lengths, and the multi-pass regime (n > 2 runs).
"""
import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu.compute.sort import sort, sort_by_key
from arrow_tpu.table import RecordBatch

N = 16384  # 2 stage-1 runs -> 1 merge pass


def test_merge_sort_single_column_stable_dupes():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 7, N).astype(np.uint32)  # heavy duplicates
    a = at.UInt32Array.from_slice(keys)
    out = sort(a, method="merge")
    np.testing.assert_array_equal(
        np.asarray(out.raw_values(), dtype=np.uint32), np.sort(keys, kind="stable")
    )


def test_merge_sort_payload_stability():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 5, N).astype(np.uint32)
    pay = np.arange(N, dtype=np.uint32)  # row ids expose any instability
    ok, op = sort_by_key(
        at.UInt32Array.from_slice(keys),
        at.UInt32Array.from_slice(pay),
        method="merge",
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok.raw_values(), np.uint32), keys[order])
    np.testing.assert_array_equal(np.asarray(op.raw_values(), np.uint32), pay[order])


def test_merge_sort_runt_length():
    rng = np.random.default_rng(2)
    n = N - 777  # logical length not a multiple of the run size
    keys = rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32)[:n]
    a = at.UInt32Array.from_slice(keys)
    out = sort(a, method="merge")
    got = np.asarray(out.raw_values(), np.uint32)
    np.testing.assert_array_equal(got, np.sort(keys, kind="stable"))
    assert (np.asarray(out.data)[n:] == 0).all()  # zero-padding invariant


def test_merge_sort_multi_pass_f32():
    rng = np.random.default_rng(3)
    n = 3 * 8192  # odd run count, 2 merge passes with a bye
    keys = rng.standard_normal(n).astype(np.float32)
    keys[:20] = np.inf
    keys[20:40] = -np.inf
    out = sort(at.Float32Array.from_slice(keys), method="merge")
    np.testing.assert_array_equal(
        np.asarray(out.raw_values(), np.float32), np.sort(keys, kind="stable")
    )


def test_merge_sort_batch_payload_mixed_dtypes():
    rng = np.random.default_rng(4)
    keys = rng.integers(0, 50, N).astype(np.int32)
    p64 = rng.integers(-(2**60), 2**60, N).astype(np.int64)
    pb = rng.random(N) < 0.5
    p16 = rng.integers(0, 2**16, N).astype(np.uint16)
    nullable_vals = rng.integers(0, 100, N).astype(np.int32)
    nullable_ok = rng.random(N) < 0.8
    batch = RecordBatch(
        {
            "w64": at.Int64Array.from_slice(p64),
            "b": at.BooleanArray.from_slice(pb.tolist()),
            "small": at.UInt16Array.from_slice(p16),
            "nul": at.Int32Array.from_optional_slice(
                [int(v) if ok else None for v, ok in zip(nullable_vals, nullable_ok)]
            ),
        }
    )
    ok, out = sort_by_key(at.Int32Array.from_slice(keys), batch, method="merge")
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok.raw_values(), np.int32), keys[order])
    np.testing.assert_array_equal(
        np.asarray(out["w64"].raw_values(), np.int64), p64[order]
    )
    np.testing.assert_array_equal(np.asarray(out["b"].raw_values()), pb[order])
    np.testing.assert_array_equal(
        np.asarray(out["small"].raw_values(), np.uint16), p16[order]
    )
    got_nul = out["nul"].values()
    for g, v, okq in zip(got_nul, nullable_vals[order], nullable_ok[order]):
        assert (g == v) if okq else (g is None)


def test_merge_method_rejects_nullable_keys():
    a = at.Int32Array.from_optional_slice([1, None, 3])
    with pytest.raises(Exception):
        sort(a, method="merge")


def test_groupby_merge_path_matches_xla(monkeypatch):
    monkeypatch.setenv("ARROW_TPU_FORCE_MERGE", "1")
    from arrow_tpu.compute.hash_aggregate import hash_aggregate

    rng = np.random.default_rng(5)
    keys_np = rng.integers(0, 200, 8192).astype(np.uint32)
    vals_np = rng.integers(-50, 50, 8192).astype(np.int32)
    keys = at.UInt32Array.from_slice(keys_np)
    vals = at.Int32Array.from_slice(vals_np)
    spec = [("s", vals, "sum"), ("c", vals, "count"), ("mn", vals, "min"), ("mx", vals, "max")]
    out = hash_aggregate(keys, spec, method="sort")
    uk = np.unique(keys_np)
    assert out.num_rows == uk.size
    exp_sum = np.zeros(uk.size, np.int64)
    for i, k in enumerate(uk):
        exp_sum[i] = vals_np[keys_np == k].sum()
    np.testing.assert_array_equal(np.asarray(out["s"].raw_values(), np.int64), exp_sum)
    np.testing.assert_array_equal(
        np.asarray(out["mn"].raw_values(), np.int64),
        [vals_np[keys_np == k].min() for k in uk],
    )


def test_join_merge_path_matches_numpy(monkeypatch):
    monkeypatch.setenv("ARROW_TPU_FORCE_MERGE", "1")
    from arrow_tpu.compute.join import join_indices

    rng = np.random.default_rng(6)
    nb, npr = 6000, 9000  # pads to 8192 / 16384
    bk = rng.integers(0, 2**40, nb).astype(np.uint64)  # real 64-bit keys
    pk = np.concatenate([bk[rng.integers(0, nb, npr - 1000)],
                         rng.integers(2**41, 2**42, 1000).astype(np.uint64)])
    rng.shuffle(pk)
    b = at.UInt64Array.from_slice(bk)
    p = at.UInt64Array.from_slice(pk)
    pi, bi, t = join_indices(b, p)
    pi_np = np.asarray(pi.raw_values(), np.uint32)
    bi_np = np.asarray(bi.raw_values(), np.uint32)
    # oracle: every (probe, build) key-equal pair exactly once
    import collections
    bmap = collections.defaultdict(list)
    for i, k in enumerate(bk):
        bmap[k].append(i)
    exp_pairs = set()
    exp_total = 0
    for j, k in enumerate(pk):
        for i in bmap.get(k, ()):
            exp_pairs.add((j, i))
            exp_total += 1
    assert t == exp_total
    got_pairs = set(zip(pi_np.tolist(), bi_np.tolist()))
    assert got_pairs == exp_pairs


def test_argsort_merge_path(monkeypatch):
    monkeypatch.setenv("ARROW_TPU_FORCE_MERGE", "1")
    from arrow_tpu.compute.sort import argsort

    rng = np.random.default_rng(7)
    n = N - 100
    keys = rng.integers(0, 50, n).astype(np.uint32)  # dupes: stability check
    order = argsort(at.UInt32Array.from_slice(keys))
    np.testing.assert_array_equal(
        np.asarray(order.raw_values(), np.uint32), np.argsort(keys, kind="stable")
    )


@pytest.mark.parametrize("npads", [0, 1000])
def test_sort_kv_unique_payload_mode(npads):
    """v2 2-plane network: payload-as-tiebreak equals the stable sort when
    the payload is a row index (incl. INT32_MAX keys vs padded rows)."""
    import jax.numpy as jnp

    from arrow_tpu.compute.kernels.merge import sort_kv_pallas

    rng = np.random.default_rng(7)
    n = 32768
    length = n - npads
    keys = rng.integers(0, 9, n).astype(np.uint32)
    keys[5] = 0x7FFFFFFF  # real INT32_MAX-as-i32 sortable key among pads
    rows = np.arange(n, dtype=np.uint32)
    ok, (orow,) = sort_kv_pallas(
        jnp.asarray(keys), (jnp.asarray(rows),), length=length,
        unique_payload=True, interpret=True,
    )
    order = np.argsort(keys[:length], kind="stable")
    np.testing.assert_array_equal(np.asarray(ok)[:length], keys[:length][order])
    np.testing.assert_array_equal(np.asarray(orow)[:length], order.astype(np.uint32))


def test_sort_kv_unique_payload_fuzz():
    import jax.numpy as jnp

    from arrow_tpu.compute.kernels.merge import sort_kv_pallas

    rng = np.random.default_rng(11)
    for trial in range(4):
        n = int(rng.choice([8192, 16384, 65536]))
        dom = int(rng.choice([2, 50, 1 << 31]))
        keys = rng.integers(0, dom, n).astype(np.uint32)
        rows = np.arange(n, dtype=np.uint32)
        ok, (orow,) = sort_kv_pallas(
            jnp.asarray(keys), (jnp.asarray(rows),),
            unique_payload=True, interpret=True,
        )
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(np.asarray(ok), keys[order])
        np.testing.assert_array_equal(np.asarray(orow), order.astype(np.uint32))
