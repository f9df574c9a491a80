"""Cluster/job sizing calculators — the arithmetic behind the knobs.

SCALE.md's rules of thumb as executable functions, so jobs size
``spark.sql.shuffle.partitions`` / ``maxPartitionBytes`` / bucket counts /
output file counts from table statistics instead of folklore. All
driver-side integer math: no Spark dependency, trivially testable.

The shared target: every task reads/writes one comfortable chunk
(128-512 MB). Too few partitions → spill + stragglers; too many → task
scheduling overhead and small-file sprawl.
"""

from __future__ import annotations

MB = 1024 * 1024
GB = 1024 * MB


def recommend_shuffle_partitions(
    shuffle_bytes: int,
    target_partition_bytes: int = 256 * MB,
    min_partitions: int = 1,
    round_to_cores: int | None = None,
) -> int:
    """Partition count for a shuffle of ``shuffle_bytes``: bytes / target,
    optionally rounded UP to a multiple of the cluster's core count so
    every wave is full (no half-idle final wave). AQE coalesces down
    safely; undersizing up-front cannot be fixed at runtime."""
    if shuffle_bytes < 0:
        raise ValueError("shuffle_bytes must be >= 0")
    n = max(min_partitions, -(-shuffle_bytes // target_partition_bytes))
    if round_to_cores and round_to_cores > 0:
        n = -(-n // round_to_cores) * round_to_cores
    return int(n)


def recommend_max_partition_bytes(
    total_bytes: int,
    cores: int,
    waves: int = 3,
    floor_bytes: int = 16 * MB,
    ceiling_bytes: int = 512 * MB,
) -> int:
    """Scan-split size so the read fans out to ~``waves`` task waves
    across ``cores`` (a few waves absorb stragglers), clamped to
    [floor, ceiling]. Feed to ``spark.sql.files.maxPartitionBytes``."""
    if cores <= 0 or waves <= 0:
        raise ValueError("cores and waves must be positive")
    ideal = total_bytes // (cores * waves) or floor_bytes
    return int(min(max(ideal, floor_bytes), ceiling_bytes))


def recommend_num_buckets(
    table_bytes: int, target_bucket_bytes: int = 256 * MB, power_of_two: bool = True
) -> int:
    """Bucket count for ``io.bucketing.write_bucketed``: size / target,
    rounded up to a power of two by default (co-bucketed joins require
    equal counts — or exact multiples with bucket coalescing — and powers
    of two keep future 2× re-bucketing aligned)."""
    n = max(1, -(-table_bytes // target_bucket_bytes))
    if power_of_two:
        p = 1
        while p < n:
            p *= 2
        n = p
    return int(n)


def recommend_output_files(
    output_bytes: int, target_file_bytes: int = 512 * MB
) -> int:
    """File count for the final ``coalesce``/``repartition`` before a
    write — the anti-small-files number. Pair with
    ``utils.repartition``."""
    return max(1, int(-(-output_bytes // target_file_bytes)))
