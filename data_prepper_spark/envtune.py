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
}


def apply_malloc_tuning() -> None:
    for k, v in _KNOBS.items():
        os.environ.setdefault(k, v)
