"""Host utilities: logging with per-frame context, wall timers.

Reference: src/cml/utils/Logger.h (spdlog macros), utils/Timer.h. The
reference's other utils — GarbageCollector, PoolAllocator, PointGrid,
DistanceMap, M128 SIMD — are mooted by the pytree/SPMD design (SURVEY.md §7):
fixed-capacity arenas need no allocator or GC, and spatial queries are masked
dense ops in models/indirect/matching.py and models/direct/selector.py.
"""

from libcml_tpu.utils.logging import (  # noqa: F401
    debug,
    error,
    fatal,
    get_logger,
    important,
    info,
    set_frame,
    set_level,
    warn,
)
from libcml_tpu.utils.timer import Timer  # noqa: F401
