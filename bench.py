"""Benchmark harness — prints ONE JSON line for the driver.

Measures the four north-star operators (BASELINE.md) plus the elementwise tier
on the real chip, reports rows/s per operator and the fraction of the per-chip
HBM roofline each achieves (the BASELINE target is >=0.80).

Headline metric: geometric mean of the four operators' roofline fractions;
`vs_baseline` = headline / 0.80 (the BASELINE.json target), so >=1.0 beats the
target.  Details go to BENCH_DETAILS.json + stderr.

≙ the reference harness `crates/benchmarks/benches/{compare_gpu_arrow,
compare_sum}.rs` (f32 add_scalar at 10,485,760 rows; u32 sum at 1M/10M rows,
bytes/s) — both reproduced here as `add_scalar_f32_10m` and `sum_u32_10m`.
"""

import json
import os
import sys
import time

import numpy as np


def _hbm_bandwidth_bytes() -> float:
    """Per-chip HBM bandwidth for roofline accounting."""
    import jax

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819e9
    if "v5p" in kind or "v5" in kind:
        return 2765e9
    if "v4" in kind:
        return 1228e9
    if "v6" in kind or "trillium" in kind:
        return 1640e9
    return 819e9  # conservative default (also used on CPU smoke runs)


def _time(fn, warmup=1, iters=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    import arrow_tpu as at
    from arrow_tpu import compute as C
    from arrow_tpu import kernels as K

    small = os.environ.get("ARROW_TPU_BENCH_SMALL", "0") == "1"
    n_filter = 1 << (22 if small else 26)  # 64M rows default
    n_sort = 1 << (20 if small else 25)  # 32M rows
    n_agg = 1 << (20 if small else 25)
    n_join = 1 << (18 if small else 23)  # 8M x 8M

    bw = _hbm_bandwidth_bytes()
    rng = np.random.default_rng(0)
    details = {"device": str(jax.devices()[0]), "hbm_bytes_per_s": bw}

    def record(name, rows, seconds, bytes_moved):
        rows_s = rows / seconds
        roofline_rows_s = rows / (bytes_moved / bw)
        frac = rows_s / roofline_rows_s
        details[name] = {
            "rows_per_s": rows_s,
            "seconds": seconds,
            "bytes": bytes_moved,
            "roofline_frac": frac,
            "gb_per_s": bytes_moved / seconds / 1e9,
        }
        print(
            f"{name}: {rows_s/1e9:.3f} Grows/s  {bytes_moved/seconds/1e9:.1f} GB/s "
            f"({frac*100:.0f}% of roofline)",
            file=sys.stderr,
        )
        return frac

    # ---- reference-harness mirrors ----------------------------------------
    n10m = 10_485_760
    a = at.Float32Array.from_slice(rng.standard_normal(n10m).astype(np.float32))
    t = _time(lambda: K.add_scalar(a, 1.5).data)
    record("add_scalar_f32_10m", n10m, t, n10m * 8)

    u = at.UInt32Array.from_slice(rng.integers(0, 1000, n10m).astype(np.uint32))
    t = _time(lambda: K.sum_(u).data)
    record("sum_u32_10m", n10m, t, n10m * 4)

    # ---- north-star operator 1: filter ------------------------------------
    x = at.Int32Array.from_slice(rng.integers(0, 1 << 30, n_filter).astype(np.int32))
    mask_np = rng.random(n_filter) < 0.5
    m = at.BooleanArray.from_slice(mask_np)
    t = _time(lambda: C.filter(x, m).data)
    # bytes: read 4 (data) + 1/8 (mask) + write 4*sel (0.5) + scan traffic ~4
    f_filter = record("filter_i32_50pct", n_filter, t, int(n_filter * (4 + 0.125 + 2)))

    # ---- north-star operator 2: radix/sort --------------------------------
    keys_np = rng.integers(0, 1 << 32, n_sort, dtype=np.uint64).astype(np.uint32)
    payload_np = np.arange(n_sort, dtype=np.uint32)
    ka = at.UInt32Array.from_slice(keys_np)
    pa = at.UInt32Array.from_slice(payload_np)
    t = _time(lambda: C.sort_by_key(ka, pa)[0].data)
    # stable key+payload sort: >= 1 read + 1 write of both columns
    f_sort = record("sort_u32_kv", n_sort, t, n_sort * 16)

    # ---- north-star operator 3: hash aggregate ----------------------------
    gk = at.UInt32Array.from_slice(rng.integers(0, 1 << 20, n_agg).astype(np.uint32))
    gv = at.Int32Array.from_slice(rng.integers(-100, 100, n_agg).astype(np.int32))
    t = _time(
        lambda: C.hash_aggregate(gk, [("s", gv, "sum"), ("c", None, "count")])["key"].data
    )
    f_agg = record("hash_agg_u32_1m_keys", n_agg, t, n_agg * 16)

    # ---- north-star operator 4: hash join ---------------------------------
    bk = at.UInt64Array.from_slice(rng.integers(0, n_join, n_join).astype(np.uint64))
    pk = at.UInt64Array.from_slice(rng.integers(0, n_join, n_join).astype(np.uint64))
    t = _time(lambda: C.join_indices(bk, pk)[0].data)
    f_join = record("hash_join_u64", 2 * n_join, t, 2 * n_join * 16)

    fracs = [f_filter, f_sort, f_agg, f_join]
    headline = float(np.exp(np.mean(np.log(np.maximum(fracs, 1e-9)))))
    details["core4_geomean_roofline_frac"] = headline
    details["total_bench_seconds"] = time.time() - t_start

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "core4_geomean_roofline_frac",
                "value": round(headline, 4),
                "unit": "fraction_of_hbm_roofline",
                "vs_baseline": round(headline / 0.80, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
