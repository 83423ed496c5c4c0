"""Process-environment tuning applied BEFORE the Spark JVM starts.

Why this exists: profiling the index build on this sandbox showed stage
times that got 3× WORSE from local[8]→local[32], with 80-90% of CPU in
kernel mode and ~200M minor page faults — glibc/pymalloc returning big
transient buffers to the OS (munmap) and re-faulting them every Arrow
batch, serialized by the virtualized memory subsystem.  Raising the
malloc retention thresholds keeps arenas resident (pages fault once),
cutting the 32-core tokenize stage from 121 s to 36 s on the same input.

Must be called before `SparkSession.builder...getOrCreate()`: the JVM
inherits the env and passes it to every pyspark worker it forks.
"""

from __future__ import annotations

import os

_KNOBS = {
    # glibc: never mmap for <1 GiB requests; never trim the heap back.
    "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
    "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
    # pyarrow's bundled (je_arrow_-prefixed) jemalloc reads this env var.
    # Its default conf purges dirty pages on a ~1 s decay timer, and any
    # allocation >= oversize_threshold (8 MiB) is purged IMMEDIATELY on
    # free regardless of decay — so every large Arrow batch buffer
    # refaults fully on the next batch.  Measured (round 5): a 32 MiB
    # alloc/free loop faults 409k pages under the default conf vs 8.2k
    # (first-touch only) under this one; an 8-core 1M-doc index build
    # drops from 7.9M to 1.0M python-worker minor faults and gains ~6%
    # wall (this host serializes minor-fault service — see BENCH.md).
    # Cost: workers retain peak-batch RSS instead of returning it.
    "JE_ARROW_MALLOC_CONF": (
        "oversize_threshold:0,dirty_decay_ms:-1,muzzy_decay_ms:-1"),
}


def apply_malloc_tuning() -> None:
    for k, v in _KNOBS.items():
        os.environ.setdefault(k, v)
