"""The r8 mmap_lock fixes: get_spark must export the glibc malloc
tunables before the JVM launches (large transient buffers — broadcast
hash relations, direct I/O — otherwise mmap/munmap per alloc/free and
serialize all task threads on the kernel's mmap_lock; measured as
random multi-second per-query stalls at local[32]), and storage block
reads must not memory-map at the default 2 MiB threshold."""

from __future__ import annotations

import os


def test_malloc_tunables_exported(spark):
    assert os.environ["MALLOC_MMAP_THRESHOLD_"] == str(1 << 30)
    assert os.environ["MALLOC_TRIM_THRESHOLD_"] == "-1"
    assert os.environ["MALLOC_ARENA_MAX"] == "4"


def test_storage_blocks_not_memory_mapped(spark):
    assert spark.conf.get("spark.storage.memoryMapThreshold") == "512m"
    # And the executor env carries the same malloc behaviour on a
    # cluster (local mode inherits the driver env instead).
    assert spark.conf.get(
        "spark.executorEnv.MALLOC_MMAP_THRESHOLD_") == str(1 << 30)
