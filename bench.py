"""Benchmark harness — prints ONE JSON line for the driver.

Measures the four north-star operators (BASELINE.md) plus the elementwise tier
on the real chip, reporting rows/s and the fraction of the per-chip HBM
roofline each achieves (BASELINE target >=0.80 of roofline for the operator
tier).

Methodology (see arrow_tpu/utils/timing.py): the deployment path may sit
behind a high-latency tunnel where single-dispatch wall-clock measures RPC
latency, not the chip, and async-completion signals are unreliable.  Every
measurement therefore runs K dependent iterations of the op inside ONE jitted
fori_loop (with optimization barriers between iterations) for two values of K;
the slope is pure device time per iteration.  All inputs are generated
on-device (host->device uploads may be ~0.1 MB/s through a tunnel).

Headline metric: geometric mean of the four operators' roofline fractions;
`vs_baseline` = headline / 0.80, so >=1.0 beats the BASELINE target.  Details
go to BENCH_DETAILS.json + stderr.

≙ the reference harness `crates/benchmarks/benches/{compare_gpu_arrow,
compare_sum}.rs` (f32 add_scalar at 10,485,760 rows; u32 sum, bytes/s) — both
mirrored here as `add_scalar_f32` and `sum_u32`.

Measurement caveat: the 10M-row mirrors are dispatch-granularity-bound
(~0.2 ms/iter against ~ms-scale queue jitter through the tunnel) and vary
2-3x run to run (observed 192-504 GB/s for sum_u32_10m across round-3 runs
while the 128M point held 442-484 GB/s).  Read the *_128m metrics for kernel
throughput; the 10M points exist for reference-harness parity.
"""

import json
import os
import sys
import time

import numpy as np


def _hbm_bandwidth_bytes() -> float:
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


# Core metrics are PRE-REGISTERED at the 1e-9 floor: a metric that crashes or
# wedges contributes ~0 to the geomean instead of silently vanishing from it
# (round 2 reported the geomean of the single survivor).
CORE_METRICS = (
    "filter_i32_50pct",
    "sort_u32_kv",
    "hash_agg_u32_1m_keys",
    "hash_agg_u32_1k_keys",
    "hash_join_u64_full",
)
_FRACS: dict = {m: 1e-9 for m in CORE_METRICS}
_DETAILS: dict = {}


def _emit_final():
    """Write the headline JSON; failed core metrics count as the 1e-9 floor."""
    fracs = [v for v in _FRACS.values()] or [1e-9]
    headline = float(np.exp(np.mean(np.log(np.maximum(fracs, 1e-9)))))
    _DETAILS["core_geomean_roofline_frac"] = headline
    _DETAILS["metrics_completed"] = sorted(
        m for m, v in _FRACS.items() if v > 1e-9
    )
    _DETAILS["metrics_failed"] = sorted(m for m, v in _FRACS.items() if v <= 1e-9)
    # CPU smoke runs must not clobber the hardware record
    out_name = (
        "BENCH_DETAILS_CPU.json"
        if os.environ.get("ARROW_TPU_BENCH_CPU") == "1"
        else "BENCH_DETAILS.json"
    )
    try:
        with open(out_name, "w") as f:
            json.dump(_DETAILS, f, indent=2)
    except Exception:
        pass
    print(
        json.dumps(
            {
                "metric": "core_geomean_roofline_frac",
                "value": round(headline, 4),
                "unit": "fraction_of_hbm_roofline",
                "vs_baseline": round(headline / 0.80, 4),
            }
        ),
        flush=True,
    )


def _watchdog(deadline_s: float):
    """Deployment paths with flaky dispatch links can wedge a measurement
    forever; emit partial results and exit rather than produce nothing."""
    import threading

    def fire():
        print(f"bench watchdog fired after {deadline_s}s", file=sys.stderr, flush=True)
        _emit_final()
        os._exit(0)

    t = threading.Timer(deadline_s, fire)
    t.daemon = True
    t.start()
    return t


def main():
    t_start = time.time()
    # deadline covers a COLD compile cache (~800s per merge-kernel shape
    # through the deployment toolchain); warm-cache runs finish in minutes
    _watchdog(float(os.environ.get("ARROW_TPU_BENCH_DEADLINE", "3300")))
    import jax

    if os.environ.get("ARROW_TPU_BENCH_CPU") == "1":
        # the deployment TPU plugin ignores JAX_PLATFORMS; only the config
        # flag restricts discovery (CPU smoke runs of this harness)
        jax.config.update("jax_platforms", "cpu")
    import jax.lax as lax
    import jax.numpy as jnp

    import arrow_tpu  # noqa: F401  (x64 on)
    from arrow_tpu.utils import bits as B
    from arrow_tpu.utils.scans import stable_partition
    from arrow_tpu.utils.timing import device_seconds_per_iter

    small = os.environ.get("ARROW_TPU_BENCH_SMALL", "0") == "1"
    n_elem = 1 << 20 if small else 10_485_760  # reference harness row count
    # BASELINE-scale row counts (the 100M-row filter config; sort/agg/join at
    # 128M, join 64M per side).  Round 1 measured at 16M, which left the
    # elementwise tier latency-bound and under-sized vs BASELINE.md configs.
    n_op = 1 << (20 if small else 27)
    n_elem_big = 1 << (20 if small else 27)

    bw = _hbm_bandwidth_bytes()
    _DETAILS.update(
        {"device": str(jax.devices()[0]), "hbm_bytes_per_s": bw, "rows": n_op}
    )

    def record(name, rows, seconds, bytes_moved, core=False, ceiling=None,
               ceiling_note=None):
        """ceiling = algorithmic_bytes / minimal REAL traffic of the chosen
        algorithm (VERDICT r4 #9): the roofline fraction a multi-pass
        algorithm would reach at 100% of HBM bandwidth.  Progress is
        tracked against it via pct_of_ceiling."""
        rows_s = rows / seconds
        frac = (bytes_moved / seconds) / bw
        _DETAILS[name] = {
            "rows_per_s": rows_s,
            "seconds_per_iter": seconds,
            "algorithmic_bytes": bytes_moved,
            "roofline_frac": frac,
            "gb_per_s": bytes_moved / seconds / 1e9,
        }
        if ceiling is not None:
            _DETAILS[name]["ceiling_frac"] = ceiling
            _DETAILS[name]["pct_of_ceiling"] = frac / ceiling
            if ceiling_note:
                _DETAILS[name]["ceiling_note"] = ceiling_note
        if core:
            _FRACS[name] = frac
        ceil_s = f" ceil={ceiling*100:.0f}%" if ceiling is not None else ""
        print(
            f"{name}: {rows_s/1e9:.3f} Grows/s  {bytes_moved/seconds/1e9:.1f} GB/s "
            f"({frac*100:.0f}% of roofline{ceil_s})",
            file=sys.stderr,
            flush=True,
        )
        return frac

    # ---- on-device data generation ----------------------------------------
    kg = jax.random.key(0)

    import functools

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def gen_u32(key, n, hi):
        return jax.random.randint(key, (n,), 0, hi, dtype=jnp.uint32)

    @functools.partial(jax.jit, static_argnums=(1,))
    def gen_f32(key, n):
        return jax.random.normal(key, (n,), dtype=jnp.float32)


    def safe(name, fn):
        """One wedged/failed metric must not kill the rest of the bench; the
        exception string lands in BENCH_DETAILS.json for diagnosis."""
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {e}"
            _DETAILS[name] = {"error": msg[:2000]}
            print(f"{name} FAILED: {msg}", file=sys.stderr, flush=True)

    # ---- operator 1: filter (predicate + compaction) ----------------------
    # every buffer is loop-carried (returned unchanged) so nothing becomes a
    # compile-time constant that XLA would fold out of the measurement
    data = gen_u32(kg, n_op, 1 << 30).astype(jnp.int32)
    mwords = jax.jit(lambda k: B.pack_bits(jax.random.bernoulli(k, 0.5, (n_op,))))(
        jax.random.key(1)
    )

    # the LIBRARY's filter program (compute/filter.py), not a hand-inlined
    # kernel call: in-kernel tail zeroing means the public path carries no
    # masking pass anymore
    from arrow_tpu.compute.filter import _pallas_filter_program

    use_pallas_filter = jax.default_backend() == "tpu" and n_op % 8192 == 0
    fprog = _pallas_filter_program((("w32", False),)) if use_pallas_filter else None

    def filter_step(y, mw):
        if use_pallas_filter:
            _count, res = fprog(mw, None, y, None)
            return res[0], mw
        bools = B.unpack_bits(mw)
        count = jnp.sum(bools, dtype=jnp.uint32)
        (part,) = stable_partition(bools, [y])
        live = lax.broadcasted_iota(jnp.uint32, (n_op,), 0) < count
        return jnp.where(live, part, jnp.zeros_like(part)), mw

    safe(
        "filter_i32_50pct",
        lambda: record(
            "filter_i32_50pct",
            n_op,
            device_seconds_per_iter(filter_step, (data, mwords)),
            int(n_op * (4 + 0.125 + 2)),
            core=True,
            ceiling=6.125 / 8.25,
            ceiling_note="one pass: read 4n+mask, write 4n windows (+3% overlap)",
        ),
    )

    # ---- operator 2: sort (key + payload, stable) -------------------------
    keys = gen_u32(jax.random.key(2), n_op, 1 << 31)  # noqa: E501  (data/mwords stay for the sweep below)
    payload = gen_u32(jax.random.key(3), n_op, 1 << 31)

    # the LIBRARY's sort_by_key: auto-routes to the Pallas LSB radix chain
    # (kernels/radix.py) on TPU at this scale — the BASELINE-named
    # algorithm, r5; measured 1.2-1.3x the fused lax.sort at 134M (which
    # itself beat the r3 Pallas merge sort).  Host-driven pass chain -> this
    # is wall-clock over warm repeated calls with forced readback
    # (block_until_ready alone returns early through the axon tunnel).
    from arrow_tpu.array.array import make_array as _mk_arr
    from arrow_tpu import dtypes as _adt
    from arrow_tpu.compute.sort import sort_by_key as _sort_by_key

    def sort_full():
        ka = _mk_arr(keys, None, n_op, _adt.ArrowType.UINT32, None)
        pa = _mk_arr(payload, None, n_op, _adt.ArrowType.UINT32, None)

        def run():
            ok, op_ = _sort_by_key(ka, pa)
            # ONE tiny readback fences the final fused epilogue program
            # (and with it the whole chain); block_until_ready alone
            # returns early through the axon tunnel, and every extra
            # readback costs an RTT that inflates wall-clock
            np.asarray(ok.data[:1])

        run()  # warm (compiles + caches)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            run()
        secs = (time.time() - t0) / reps
        # radix passes = significant key bits (31 here); per-pass real
        # traffic = 16n bytes (read+write k+v), plus prep/pad + final
        # combine — the achievable ceiling at 100% HBM bandwidth
        pass_ct = 31
        ceil = (n_op * 16) / (n_op * 16 * pass_ct + n_op * 40)
        record(
            "sort_u32_kv", n_op, secs, n_op * 16, core=True, ceiling=ceil,
            ceiling_note=f"stable LSB radix, {pass_ct} passes x 16n bytes + prep/combine 40n",
        )

    safe("sort_u32_kv", sort_full)


    # the prior rounds' bound for comparison (detail metric, not core)
    def sort_step(k, p):
        out = lax.sort([k, p], num_keys=1, is_stable=True)
        return out[0], out[1]

    safe(
        "sort_u32_kv_xla",
        lambda: record(
            "sort_u32_kv_xla",
            n_op,
            device_seconds_per_iter(sort_step, (keys, payload)),
            n_op * 16,
        ),
    )

    del keys, payload

    # ---- operator 3: hash aggregate (GROUP BY u32, sum+count) -------------
    # the LIBRARY's group-by program (hash_aggregate's sort path: Pallas merge
    # sort + streaming segmented scans + Pallas compaction on TPU)
    gkeys = gen_u32(jax.random.key(4), n_op, 1 << 20)
    gvals = gen_u32(jax.random.key(5), n_op, 200).astype(jnp.int32)

    # the library's dense-domain PARTITION path (r4): class-split via block
    # compactions + streaming region-MXU kernel — what hash_aggregate's auto
    # routing picks for a 2^20 domain (key_domain pipeline form)
    from arrow_tpu.compute.hash_aggregate import (
        _groupby_program,
        _partition_groupby_program,
    )

    gprog = _groupby_program(
        (
            n_op,
            n_op,
            False,
            False,
            (("sum", "int32", False), ("count_all", "", False)),
        )
    )

    def agg_step_sort(k, v):
        _ng, gkey, _gsum, _gcnt = gprog(k, None, v)
        return k ^ (gkey[0] & jnp.uint32(1)), v

    # the partition path is host-composed since r5 (prep -> Pallas radix
    # chain -> region kernel), so dense-domain configs measure as wall-clock
    # over warm repeated calls with forced readback
    def agg_partition_time(k, v):
        pprog = _partition_groupby_program((n_op, n_op, 20, (1,)))

        def run():
            cnt, _tot = pprog(k, v)
            np.asarray(cnt[:1]); np.asarray(cnt[-1:])

        run()  # warm
        t0 = time.time()
        reps = 2
        for _ in range(reps):
            run()
        return (time.time() - t0) / reps

    # 8 chain passes x 16n + prep 16n + combine 24n + region read 8n+
    agg_ceil = 16.0 / (8 * 16 + 16 + 24 + 10)
    agg_note = "radix class-partition (8 passes x 16n) + prep/combine + region-MXU read"
    if jax.default_backend() == "tpu":
        safe(
            "hash_agg_u32_1m_keys",
            lambda: record(
                "hash_agg_u32_1m_keys",
                n_op,
                agg_partition_time(gkeys, gvals),
                n_op * 16,
                core=True,
                ceiling=agg_ceil,
                ceiling_note=agg_note,
            ),
        )
    else:
        safe(
            "hash_agg_u32_1m_keys",
            lambda: record(
                "hash_agg_u32_1m_keys",
                n_op,
                device_seconds_per_iter(agg_step_sort, (gkeys, gvals)),
                n_op * 16,
                core=True,
            ),
        )

    # BASELINE sweep: the 1K-distinct-keys point rides the MXU one-hot kernel
    from arrow_tpu.compute.kernels.groupby_mxu import groupby_dense_pallas

    dkeys = gen_u32(jax.random.key(10), n_op, 1 << 10)
    dvals = gen_u32(jax.random.key(11), n_op, 200).astype(jnp.int32)

    def agg1k_step(k, v):
        cnt, _tot = groupby_dense_pallas(k, v, nlimb=1)
        return k ^ (cnt[0] & 1).astype(jnp.uint32), v

    if jax.default_backend() == "tpu":
        safe(
            "hash_agg_u32_1k_keys",
            lambda: record(
                "hash_agg_u32_1k_keys",
                n_op,
                device_seconds_per_iter(agg1k_step, (dkeys, dvals)),
                n_op * 8,
                core=True,
                ceiling=1.0,
                ceiling_note="single read of k+v; MXU one-hot compute bound, not bandwidth",
            ),
        )
    else:
        # CPU smoke runs can't exercise the MXU kernel; don't penalize them
        _FRACS.pop("hash_agg_u32_1k_keys", None)

    # BASELINE distribution sweep ("1K-100M distinct keys incl. skew"): the
    # same compiled group-by program, different key distributions — skew only
    # changes segment lengths, not the executable
    @functools.partial(jax.jit, static_argnums=(1, 2))
    def gen_zipfish(key, n, dom):
        # heavy-hitter power-law: u^4 concentrates ~50% of rows on ~6% of keys
        u = jax.random.uniform(key, (n,), dtype=jnp.float32)
        return (u * u * u * u * dom).astype(jnp.uint32)

    zkeys = gen_zipfish(jax.random.key(12), n_op, 1 << 20)
    safe(
        "hash_agg_u32_skew",
        lambda: record(
            "hash_agg_u32_skew",
            n_op,
            agg_partition_time(zkeys, gvals)
            if jax.default_backend() == "tpu"
            else device_seconds_per_iter(agg_step_sort, (zkeys, gvals)),
            n_op * 16,
        ),
    )
    wkeys = gen_u32(jax.random.key(13), n_op, 1 << 31)  # ~100M distinct
    # 2^31 domain exceeds the partition gate: the library routes it to the
    # radix-sorted group-by (r5) — measure the LIBRARY path wall-clock
    def agg_100m():
        if jax.default_backend() != "tpu":
            return record(
                "hash_agg_u32_100m_keys",
                n_op,
                device_seconds_per_iter(agg_step_sort, (wkeys, gvals)),
                n_op * 16,
            )
        from arrow_tpu.compute.hash_aggregate import hash_aggregate

        ka = _mk_arr(wkeys, None, n_op, _adt.ArrowType.UINT32, None)
        va = _mk_arr(
            gvals, None, n_op, _adt.ArrowType.INT32, None
        )

        def run():
            out = hash_aggregate(ka, [("s", va, "sum"), ("c", va, "count")])
            np.asarray(out["key"].data[:1])

        run()  # warm
        t0 = time.time()
        reps = 2
        for _ in range(reps):
            run()
        record(
            "hash_agg_u32_100m_keys",
            n_op,
            (time.time() - t0) / reps,
            n_op * 16,
            ceiling=16.0 / (31 * 16 + 40 + 30),
            ceiling_note="library auto route; ceiling stated for a 31-pass "
            "radix grouping (the lax.sort route's internal traffic is "
            "opaque; measured crossover is ~28 significant bits)",
        )

    safe("hash_agg_u32_100m_keys", agg_100m)
    del gkeys, gvals, dkeys, dvals, zkeys, wkeys

    # ---- operator 4: hash join (u64 keys) ---------------------------------
    # u64 keys ride as 32-bit limb pairs (compute/join.py::probe_bounds):
    # emulated 64-bit comparators both run ~2x slower and crash some
    # deployment toolchains inside the timing loop
    from arrow_tpu.compute.join import join_indices, probe_bounds

    nj = n_op // 2
    bk = gen_u32(jax.random.key(6), nj, nj).astype(jnp.uint64)
    pk = gen_u32(jax.random.key(7), nj, nj).astype(jnp.uint64)

    # CORE metric (r4, VERDICT #4): the FULL materialized join — count, emit,
    # build-row resolution — through the library's join_indices (the r1-r3
    # core metric timed only the count phase).  join_indices host-syncs the
    # output size, so this is wall-clock over repeated warm calls (~1s+ ops
    # vs ~ms dispatch noise).
    from arrow_tpu.array.array import make_array
    from arrow_tpu import dtypes as adt

    def join_full():
        ba = make_array(bk, None, nj, adt.ArrowType.UINT64, None)
        pa = make_array(pk, None, nj, adt.ArrowType.UINT64, None)
        pi, bi, t = join_indices(ba, pa)  # warm (compiles + caches)
        jax.block_until_ready((pi.data, bi.data))
        t0 = time.time()
        reps = 2
        for _ in range(reps):
            pi, bi, _t = join_indices(ba, pa)
            jax.block_until_ready((pi.data, bi.data))
        record(
            "hash_join_u64_full",
            2 * nj,
            (time.time() - t0) / reps,
            2 * nj * 16,
            core=True,
            # plan radix co-sort (~26 narrowed-bit passes x 8B/row over
            # nb+np rows) + plan prep/post scans/compactions + expand +
            # rank-fill merge/fill/compact passes (~30 sweeps equivalent)
            ceiling=16.0 / (26 * 8 + 110),
            ceiling_note="radix plan co-sort + scans/compactions + merge-expand emit",
        )
        _DETAILS["hash_join_u64_full"]["output_rows"] = int(t)

    safe("hash_join_u64_full", join_full)

    def join_step(p, b):
        ones = jnp.ones((nj,), bool)
        lo, hi = probe_bounds(b, ones, p, ones, ordered=False)
        total = jnp.sum(hi - lo, dtype=jnp.int32)
        return p ^ (total & 1).astype(jnp.uint64), b

    safe(
        "hash_join_u64_count",
        lambda: record(
            "hash_join_u64_count",
            2 * nj,
            device_seconds_per_iter(join_step, (pk, bk)),
            2 * nj * 16,
        ),
    )

    # BASELINE "skewed keys" config: heavy-hitter probe side, same executable
    pk_skew = jax.jit(
        lambda k: (
            jax.random.uniform(k, (nj,), dtype=jnp.float32) ** 4 * nj
        ).astype(jnp.uint64)
    )(jax.random.key(14))
    safe(
        "hash_join_u64_skew",
        lambda: record(
            "hash_join_u64_skew",
            2 * nj,
            device_seconds_per_iter(join_step, (pk_skew, bk)),
            2 * nj * 16,
        ),
    )

    del pk, bk, pk_skew

    # ---- reference-harness mirrors (elementwise tier) ---------------------
    # elementwise iterations are ~0.2ms at 10M rows; hundreds of chained
    # iterations are needed to rise above the ~30ms dispatch/readback noise
    xf = gen_f32(kg, n_elem)
    # in-loop timing collapses trivial elementwise chains on some AOT paths
    # and single-dispatch wall-clock measures dispatch latency; instead time a
    # host-side chain of k async dispatches (device executes them back to
    # back) and slope two chain lengths — readback reliably awaits the queue
    def queue_slope(fn, x, k_lo=8, k_hi=72):
        f = jax.jit(fn)
        y = f(x)
        np.asarray(y.ravel()[:1])  # warm compile

        def run(k):
            t0 = time.perf_counter()
            z = x
            for _ in range(k):
                z = f(z)
            np.asarray(z.ravel()[:1])
            return time.perf_counter() - t0

        ts = [(run(k_hi) - run(k_lo)) / (k_hi - k_lo) for _ in range(2)]
        return max(float(np.median(ts)), 1e-9)

    safe(
        "add_scalar_f32_10m",
        lambda: record(
            "add_scalar_f32_10m",
            n_elem,
            queue_slope(lambda y: y * 1.0001 + 1.5, xf),
            n_elem * 8,
        ),
    )

    xu = gen_u32(kg, n_elem, 1000)

    # pure reduction: carry (y, acc) so each iteration reads y ONCE and the
    # array is never re-materialized (the r1-r3 formulation re-broadcast y
    # every iteration, so the metric measured 3x the algorithmic traffic and
    # under-reported the kernel by ~2x).  The xor by the FULL accumulator
    # fuses into the reduction (one read pass, nothing materialized) and is
    # not hoistable/enumerable — LICM defeated both a plain sum(y) (through
    # the optimization barrier) and an (acc & 1)-xor whose two possible
    # operands it could precompute.  Sub-ms iterations also need a large K
    # delta: at the default 10-iteration slope the tunnel's dispatch jitter
    # produced 65%-157% readings; at 100 iterations four repeats measured
    # 89-92% (sum_forms2 probe).
    def sum_step(y, acc):
        return y, acc + jnp.sum(y ^ acc, dtype=jnp.uint32)

    acc0 = jnp.zeros((), jnp.uint32)
    safe(
        "sum_u32_10m",
        lambda: record(
            "sum_u32_10m",
            n_elem,
            device_seconds_per_iter(sum_step, (xu, acc0), k_lo=16, k_hi=416),
            n_elem * 4,
        ),
    )

    # same two at BASELINE scale (the 10M sizes are dispatch-latency-bound)
    xf_big = gen_f32(jax.random.key(8), n_elem_big)
    safe(
        "add_scalar_f32_128m",
        lambda: record(
            "add_scalar_f32_128m",
            n_elem_big,
            queue_slope(lambda y: y * 1.0001 + 1.5, xf_big, k_lo=4, k_hi=24),
            n_elem_big * 8,
        ),
    )
    xu_big = gen_u32(jax.random.key(9), n_elem_big, 1000)
    safe(
        "sum_u32_128m",
        lambda: record(
            "sum_u32_128m",
            n_elem_big,
            device_seconds_per_iter(
                sum_step, (xu_big, acc0), k_lo=10, k_hi=110, repeats=3
            ),
            n_elem_big * 4,
        ),
    )
    del xf_big, xu_big

    # ---- full selectivity sweep (BASELINE filter config, always on) --------
    if os.environ.get("ARROW_TPU_BENCH_SWEEP", "1") == "1":
        for sel in (0.01, 0.10, 0.50, 0.90, 0.99):
            mw = jax.jit(
                lambda k, s=sel: B.pack_bits(jax.random.bernoulli(k, s, (n_op,)))
            )(jax.random.key(int(sel * 1000)))
            safe(
                f"filter_i32_sel{int(sel*100):02d}",
                lambda mw=mw, sel=sel: record(
                    f"filter_i32_sel{int(sel*100):02d}",
                    n_op,
                    device_seconds_per_iter(filter_step, (data, mw)),
                    int(n_op * (4 + 0.125 + 4 * sel)),
                ),
            )

    # ---- HBM-capacity-max sort point LAST (VERDICT r4 #8) -----------------
    # this config peaks at 12.9 GB of chain state: it runs after every other
    # metric with the bench's remaining arrays freed, because a hard OOM
    # wedges this deployment's TPU client for the REST of the process
    # (observed: one mid-bench OOM cascaded into every later metric)
    try:
        del data, mwords
    except NameError:
        pass
    # ---- ~400M-row single-chip sort point (VERDICT r4 #8) -----------------
    # HBM math (v5e: 15.75 GB usable): one radix pass holds in + out state =
    # 8 cap buffers x ~4(n+slack) bytes.  n = 2^29 (537M) needs 17.2 GB ->
    # impossible (donation does not help: XLA copy-protects aliased pallas
    # inputs, measured); n = 3*2^27 = 402M rows needs 12.9 GB -> the honest
    # single-chip k+v maximum, with the raw generator buffers freed
    # pre-pass and single (un-fused) pass dispatches.  1B x (k+v) needs
    # 2x chain state beyond any of this -> the 1B configuration is the
    # N-host run (virtual-mesh correctness: tools/dist_sort_1b.py).
    def sort_402m():
        if jax.default_backend() != "tpu" or small:
            return
        n5 = 3 << 27
        from arrow_tpu.compute.kernels.radix import (
            radix_sort_chain_parts,
        )

        from arrow_tpu.compute.kernels.radix import _to_cap, cap_rows_for

        rows5 = cap_rows_for(n5)

        def make_inputs(seed):
            # HBM discipline at 2^29: the raw generator outputs must die
            # before the first pass (capped pair 4.3 GB + pass outputs
            # 8.6 GB + originals 4.3 GB would exceed 16 GB)
            k5 = gen_u32(jax.random.key(seed), n5, 1 << 31)
            ks = int(jnp.sum(k5, dtype=jnp.uint64))
            kc = _to_cap(lax.bitcast_convert_type(k5, jnp.int32), rows5)
            del k5
            p5 = gen_u32(jax.random.key(seed + 1), n5, 1 << 31)
            pc = _to_cap(lax.bitcast_convert_type(p5, jnp.int32), rows5)
            del p5
            jax.block_until_ready((kc, pc))
            return kc, pc, ks

        def run(kc, pc):
            st, bd = radix_sort_chain_parts(
                (kc, pc), list(range(31)), n5, precapped=True
            )
            np.asarray(st[0][0][:1])
            return st, bd

        kc, pc, ksum = make_inputs(20)
        streams, bounds = run(kc, pc)  # warm
        del streams
        t0 = time.time()
        streams, bounds = run(kc, pc)
        secs = time.time() - t0
        del kc, pc
        # correctness: checksum preserved + sorted head sample
        bs = [0] + [int(b) for b in bounds] + [n5]
        head = np.asarray(streams[0][0].reshape(-1)[: 1 << 16]).astype(np.uint32)
        assert (np.diff(head.astype(np.int64)) >= 0).all(), "512m head unsorted"
        tot = 0
        for t in range(len(streams)):
            seg = bs[t + 1] - bs[t]
            if seg:
                tot += int(
                    jnp.sum(
                        streams[t][0].reshape(-1)[:seg].astype(jnp.uint32),
                        dtype=jnp.uint64,
                    )
                )
        assert tot & ((1 << 64) - 1) == ksum, "512m checksum"
        del streams
        record(
            "sort_u32_kv_402m",
            n5,
            secs,
            n5 * 16,
            ceiling=16.0 / (31 * 16 + 40),
            ceiling_note="stable LSB radix at 402M rows (HBM-capacity-max single-chip k+v config)",
        )

    safe("sort_u32_kv_402m", sort_402m)

    # N>=2 scaling efficiency (tools/scaling_bench.py: multi-process
    # jax.distributed over localhost — the BASELINE >=75% metric's
    # measurement machinery; real N>=2 TPU hosts are unreachable here)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json")
        ) as f:
            _DETAILS["scaling_multiprocess_cpu"] = json.load(f)
    except Exception:
        pass

    _DETAILS["total_bench_seconds"] = time.time() - t_start
    _emit_final()


if __name__ == "__main__":
    main()
