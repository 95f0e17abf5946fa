"""arrow_tpu — a TPU-native vectorized Arrow compute engine.

Brand-new JAX/XLA/Pallas re-design with the capabilities of psvri/arrow-gpu
(reference mounted at /root/reference; see SURVEY.md for the structural map):
columnar arrays in HBM (dense padded value buffers + packed validity bitmaps),
an elementwise kernel tier lowered to fused XLA programs, Pallas kernels for the
compaction/aggregation/sort/join operator tier, and a distributed layer
(mesh-sharded tables + all-to-all shuffles) the reference does not have.

Public surface (≙ the umbrella crate `crates/arrow/src/lib.rs:1-3`):

    import arrow_tpu as at
    a = at.Float32Array.from_slice([1.0, 2.0, 3.0])
    b = at.kernels.add_scalar(a, 10.0)
    b.values()
"""

# 64-bit dtypes (u64 keys for the distributed join/sort tier) require x64.
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compile cache: Mosaic compiles of the operator kernels cost
# 200-800s each through the deployment toolchain; caching executables on disk
# makes every process after the first (tests, bench.py, the driver) hit warm.
# Opt out with ARROW_TPU_COMPILE_CACHE=0.
_cache_dir = _os.environ.get(
    "ARROW_TPU_COMPILE_CACHE", _os.path.expanduser("~/.jax_cache")
)
# CPU-restricted processes (tests, multichip dryrun, CPU bench smoke) skip
# the cache: XLA:CPU AOT entries record compile-machine features and can
# SIGILL when replayed across feature mismatches; only the (expensive) TPU
# compiles are worth caching
_platforms = getattr(_jax.config, "jax_platforms", None)
if (
    "xla_force_host_platform_device_count" in _os.environ.get("XLA_FLAGS", "")
    or (_platforms and "tpu" not in _platforms and "axon" not in _platforms)
):
    _cache_dir = None
if _cache_dir and _cache_dir != "0":
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags
        pass

from . import dtypes  # noqa: E402
from .array import (  # noqa: E402,F401
    ArrowArray,
    ArrowArrayBase,
    BitBufferBuilder,
    BooleanArray,
    Buffer,
    Date32Array,
    Float32Array,
    Float64Array,
    Int8Array,
    Int16Array,
    Int32Array,
    Int64Array,
    NullBitBuffer,
    PrimitiveArray,
    Scalar,
    UInt8Array,
    UInt16Array,
    UInt32Array,
    UInt64Array,
    make_array,
)
from .dtypes import ArrowType, DataType  # noqa: E402
from .errors import ArrowTpuError, CastingNotSupported, OperationNotSupported  # noqa: E402
from .runtime import (  # noqa: E402
    ComputePipeline,
    Device,
    LazyArray,
    default_device,
    set_default_device,
)

from . import kernels  # noqa: E402  (after array types; registers all ops)
from .config import config, set_config  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "ArrowArray",
    "ArrowArrayBase",
    "ArrowType",
    "ArrowTpuError",
    "BitBufferBuilder",
    "BooleanArray",
    "Buffer",
    "CastingNotSupported",
    "ComputePipeline",
    "DataType",
    "Date32Array",
    "Device",
    "Float32Array",
    "Float64Array",
    "Int8Array",
    "Int16Array",
    "Int32Array",
    "Int64Array",
    "LazyArray",
    "NullBitBuffer",
    "OperationNotSupported",
    "PrimitiveArray",
    "Scalar",
    "UInt8Array",
    "UInt16Array",
    "UInt32Array",
    "UInt64Array",
    "config",
    "default_device",
    "dtypes",
    "kernels",
    "make_array",
    "set_config",
    "set_default_device",
]
