"""Plan-shaping helpers for degenerate input parallelism.

A Parquet file is only scan-parallel down to its row groups; a
single-row-group file (common for small exports and test fixtures) yields a
one-task scan, and every narrow transformation above it — tokenize, hash,
explode, per-row feature extraction — inherits that single task no matter
how many cores the cluster has.

``ensure_parallelism`` is the guard the CPU-heavy operators place between
the scan and their hash/tokenize stages: when the incoming plan already has
enough partitions (any real multi-file / multi-row-group dataset at scale)
it is the identity and adds nothing to the plan; only when the input is
under-partitioned does it insert one round-robin repartition, trading a
shuffle of the (small, by construction) input for full-width execution of
everything above it.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: Optional[int] = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` iff it has fewer.

    Identity on inputs that are already parallel enough — the common case
    on a cluster — so operators can call it unconditionally.

    The partition-count probe (``df.rdd.getNumPartitions()``) forces a
    physical plan conversion per call — milliseconds, but pure overhead on
    clusters whose inputs are always wide. Set
    ``spark.polario.ensureParallelism=off`` there to make this a true
    no-op; the default ``auto`` keeps the guard for small/fixture inputs.
    """
    spark = df.sparkSession
    if spark.conf.get("spark.polario.ensureParallelism", "auto") == "off":
        return df
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
