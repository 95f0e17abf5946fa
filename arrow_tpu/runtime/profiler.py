"""Per-op profiling (≙ the reference's ``CmpQuery`` GPU timestamp queries,
`/root/reference/crates/array/src/gpu_utils/compute_query.rs`, behind its
`profile` cargo feature).

On TPU the analog of per-pass timestamp queries is wall-clock timing around
``block_until_ready`` plus `jax.profiler` traces for intra-program detail.
Enable with ARROW_TPU_PROFILE=1 or ``config.profile = True``; timings accumulate
in a process-wide log (the reference logs ms per pass, `compute_query.rs:71-74`).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, List

import jax

from ..config import config

log = logging.getLogger("arrow_tpu")

_TIMINGS: Dict[str, List[float]] = defaultdict(list)


def record(name: str, seconds: float) -> None:
    _TIMINGS[name].append(seconds)
    log.debug("arrow_tpu profile: %s took %.3f ms", name, seconds * 1e3)


@contextlib.contextmanager
def profile_region(name: str):
    """Time a region to completion (blocks on outstanding work at exit)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        record(name, time.perf_counter() - t0)


def timed_call(name: str, fn, *args):
    """Run fn, blocking until device completion, and record the wall time."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    record(name, time.perf_counter() - t0)
    return out


def timings() -> Dict[str, List[float]]:
    return dict(_TIMINGS)


def reset() -> None:
    _TIMINGS.clear()


def summary() -> str:
    lines = []
    for name, ts in sorted(_TIMINGS.items()):
        total = sum(ts)
        lines.append(
            f"{name:32s} calls={len(ts):5d} total={total*1e3:9.2f}ms "
            f"mean={total/len(ts)*1e3:8.3f}ms"
        )
    return "\n".join(lines)


# -- jax.profiler passthrough (device-level traces) --------------------------


def start_trace(logdir: str) -> None:
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


@contextlib.contextmanager
def trace(logdir: str):
    start_trace(logdir)
    try:
        yield
    finally:
        stop_trace()
