"""Runtime tier: device management, lazy pipelines, jit caching, native host lib.

≙ reference `crates/array/src/gpu_utils/` (SURVEY.md §1 L1).
"""

from . import profiler
from .device import Device, default_device, set_default_device
from .pipeline import ComputePipeline, LazyArray

__all__ = [
    "ComputePipeline",
    "Device",
    "LazyArray",
    "default_device",
    "profiler",
    "set_default_device",
]
