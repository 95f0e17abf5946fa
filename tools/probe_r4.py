"""Round-4 design probes on the real chip (run ONCE, detached, results JSON).

Measures the numbers that decide the round-4 kernel designs (VERDICT r3 next
1/2/3/5/9):
  1. flat lax.sort [k,v] at 134M           — the bound to beat (r3: 586 ms)
  2. batched lax.sort at run lengths 8K-64K — stage-1 cost curve for the
     merge sort (how long should stage-1 runs be?)
  3. jnp.sum vs the double-buffered Pallas sum at 128M (wire or retire)
  4. ONE merge pass, current kernel (r3: 91.6 ms) — same-session baseline
  5. microbench: merge-step compute formulations on VMEM-resident tiles
     (roll-pair vs taa-XOR lane stages) — picks the v2 network
  6. i1->bf16 astype inside a kernel (groupby one-hot construction needs it)
  7. lax.ragged_all_to_all on a 1-device TPU mesh (VERDICT #9)

Run: nohup bash -c 'timeout 3000 python tools/probe_r4.py' > /tmp/probe_r4.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import arrow_tpu  # noqa: F401  (x64 + persistent compile cache)
import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arrow_tpu.utils.timing import device_seconds_per_iter

OUT = {}
LANES = 128


def save():
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PROBE_R4.json"), "w") as f:
        json.dump(OUT, f, indent=2)


def step(name, fn):
    t0 = time.time()
    try:
        OUT[name] = fn()
        print(f"[OK] {name}: {OUT[name]} ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        OUT[name] = {"error": f"{type(e).__name__}: {e}"[:500]}
        print(f"[FAIL] {name}: {e}", flush=True)
    save()


N = 1 << 27  # 134M


def main():
    print("devices:", jax.devices(), flush=True)
    keys = jax.jit(lambda k: jax.random.randint(k, (N,), 0, 1 << 31, dtype=jnp.uint32))(jax.random.key(0))
    vals = jax.jit(lambda k: jax.random.randint(k, (N,), 0, 1 << 31, dtype=jnp.uint32))(jax.random.key(1))
    keys.block_until_ready()

    # ---- 1. flat sort baseline -------------------------------------------
    def flat(k, v):
        out = lax.sort([k, v], num_keys=1, is_stable=True)
        return out[0], out[1]

    step("sort_flat_134m_s", lambda: device_seconds_per_iter(flat, (keys, vals), k_lo=2, k_hi=5))

    # ---- 2. batched stage-1 sweep ----------------------------------------
    for L in (8192, 16384, 32768, 65536):
        def batched(k, v, L=L):
            out = lax.sort([k.reshape(-1, L), v.reshape(-1, L)], dimension=1, num_keys=1, is_stable=True)
            return out[0].reshape(-1), out[1].reshape(-1)

        step(f"sort_batched_{L}_s", lambda b=batched: device_seconds_per_iter(b, (keys, vals), k_lo=2, k_hi=6))

    # ---- 3. sum: XLA vs Pallas at 128M -----------------------------------
    su = jax.jit(lambda k: jax.random.randint(k, (N,), 0, 1000, dtype=jnp.uint32))(jax.random.key(2))

    def sum_xla(y):
        return y + (jnp.sum(y, dtype=jnp.uint32) & jnp.uint32(1))

    step("sum_xla_128m_s", lambda: device_seconds_per_iter(sum_xla, (su,), k_lo=3, k_hi=13))

    from arrow_tpu.compute.kernels.reduction import sum_pallas

    def sum_pk(y):
        return y + (sum_pallas(y) & jnp.uint32(1))

    step("sum_pallas_128m_s", lambda: device_seconds_per_iter(sum_pk, (su,), k_lo=3, k_hi=13))
    del su

    # ---- 4. current merge pass baseline ----------------------------------
    from arrow_tpu.compute.kernels.merge import merge_pass_pallas, to_sortable_i32

    k1 = to_sortable_i32(keys)
    ks = lax.sort([k1.reshape(-1, 8192)], dimension=1)[0].reshape(-1)
    vi = lax.bitcast_convert_type(vals, jnp.int32)

    def one_pass(a, b):
        o = merge_pass_pallas((a, b), jnp.int32(8192))
        return o[0], o[1]

    step("merge_pass_r3_134m_s", lambda: device_seconds_per_iter(one_pass, (ks, vi), k_lo=2, k_hi=5))

    # ---- 5. step-compute microbench (no DMA) ------------------------------
    # One merge step at T=4096 on VMEM-resident deques: extraction + reversal
    # + half-cleaner + 12-stage clean of 3 net planes, looped R times.  Two
    # lane-stage formulations: (a) roll-pair (current), (b) taa XOR-partner.
    from arrow_tpu.compute.kernels.compaction import _flat_roll_left, _flat_roll_right
    from arrow_tpu.compute.kernels.merge import _flat_roll_left_dyn, _reverse_tile
    from arrow_tpu.compute.kernels.kutils import taa_lanes

    T, TR = 4096, 32

    def make_step_kernel(use_taa: bool):
        def kern(r_ref, a_ref, b_ref, o_ref):
            ii = lax.broadcasted_iota
            iota_flat = ii(jnp.int32, (TR, LANES), 0) * LANES + ii(jnp.int32, (TR, LANES), 1)
            lane_i = ii(jnp.int32, (TR, LANES), 1)

            def body(j, st):
                hA, acc = st
                winA = _flat_roll_left_dyn(a_ref[...], hA)[:TR, :]
                winB = _flat_roll_left_dyn(b_ref[...], hA + jnp.int32(7))[:TR, :]
                revB = _reverse_tile(winB)
                lessA = winA <= revB
                k_ = jnp.where(lessA, winA, revB)
                t = jnp.where(lessA, iota_flat, jnp.int32(2 * T - 1) - iota_flat)
                v = jnp.where(lessA, winA ^ jnp.int32(3), revB ^ jnp.int32(5))
                one32 = jnp.ones((TR, LANES), jnp.int32)
                zero32 = jnp.zeros((TR, LANES), jnp.int32)
                for s in range(T.bit_length() - 2, -1, -1):
                    d = 1 << s
                    posbit = (iota_flat & d) != 0
                    if use_taa and d < LANES:
                        pk = taa_lanes(k_, lane_i ^ d)
                        pt = taa_lanes(t, lane_i ^ d)
                        pv = taa_lanes(v, lane_i ^ d)
                        cond = jnp.logical_or(k_ < pk, jnp.logical_and(k_ == pk, t < pt))
                        takeSelf = jnp.logical_xor(cond, posbit)
                        k_ = jnp.where(takeSelf, pk, k_)
                        t = jnp.where(takeSelf, pt, t)
                        v = jnp.where(takeSelf, pv, v)
                    else:
                        Lk = _flat_roll_left(k_, d)
                        Lt = _flat_roll_left(t, d)
                        keep32 = jnp.where(
                            jnp.logical_or(k_ < Lk, jnp.logical_and(k_ == Lk, t <= Lt)),
                            one32, zero32,
                        )
                        takeSelf = (jnp.where(posbit, _flat_roll_right(keep32, d), keep32) == 1)

                        def ce(x, Lx):
                            other = jnp.where(posbit, _flat_roll_right(x, d), Lx)
                            return jnp.where(takeSelf, x, other)

                        nk = ce(k_, Lk)
                        nt = ce(t, Lt)
                        v = ce(v, _flat_roll_left(v, d))
                        k_, t = nk, nt
                    del posbit
                acc = acc + k_ + v
                hA = lax.rem(hA + jnp.int32(1789), jnp.int32(2 * T))
                return hA, acc

            _, acc = lax.fori_loop(jnp.int32(0), r_ref[0], body, (jnp.int32(0), jnp.zeros((TR, LANES), jnp.int32)))
            o_ref[...] = acc

        return kern

    a0 = jnp.arange(2 * T, dtype=jnp.int32).reshape(-1, LANES)
    for nm, taa in (("step_rollpair", False), ("step_taa", True)):
        prog = pl.pallas_call(
            make_step_kernel(taa),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TR, LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )

        def run(R, prog=prog):
            r = jnp.full((1,), R, jnp.int32)
            o = prog(r, a0, a0)
            o.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(3):
                o = prog(r, a0, a0)
            o.block_until_ready()
            return (time.perf_counter() - t0) / 3

        def measure(run=run):
            t_lo, t_hi = run(256), run(4096)
            us = (t_hi - t_lo) / (4096 - 256) * 1e6
            return {"us_per_step": us, "grows_per_s_per_pass": T / us / 1e3}

        step(f"mb_{nm}", measure)

    # ---- 6. i1 -> bf16 astype --------------------------------------------
    def conv_kern(x_ref, o_ref):
        c = x_ref[...] > 0
        o_ref[...] = c.astype(jnp.bfloat16) @ jnp.ones((LANES, LANES), jnp.bfloat16)

    def conv_probe():
        x = jnp.ones((LANES, LANES), jnp.int32)
        o = pl.pallas_call(
            conv_kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((LANES, LANES), jnp.bfloat16),
        )(x)
        return {"ok": bool((np.asarray(o) == 128).all())}

    step("i1_to_bf16_astype", conv_probe)

    # ---- 7. ragged_all_to_all on 1-device TPU mesh ------------------------
    def ragged_probe():
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
        op = jnp.arange(16, dtype=jnp.int32)
        outb = jnp.zeros(16, jnp.int32)
        i_off = jnp.array([0], jnp.int32)
        s_sz = jnp.array([4], jnp.int32)
        o_off = jnp.array([2], jnp.int32)
        r_sz = jnp.array([4], jnp.int32)

        def f(op, outb, io, ss, oo, rs):
            return lax.ragged_all_to_all(op, outb, io, ss, oo, rs, axis_name="x")

        g = shard_map(
            f, mesh=mesh,
            in_specs=(P("x"), P("x"), P("x"), P("x"), P("x"), P("x")),
            out_specs=P("x"),
        )
        r = jax.jit(g)(op, outb, i_off, s_sz, o_off, r_sz)
        return {"ok": True, "out_head": np.asarray(r)[:8].tolist()}

    step("ragged_all_to_all_tpu_1dev", ragged_probe)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
