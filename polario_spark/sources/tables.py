"""Canonical loaders for the benchmark/test tables.

One place to read ``/root/testdata/sf*/{table}.parquet`` with the quirks
handled, so every query sees identical frames:

- ``events.ts`` is INT64 TIMESTAMP(NANOS) in the file. Spark's parquet
  reader rejects nanos; with ``spark.sql.legacy.parquet.nanosAsLong=true``
  (set in polario_spark.session) it arrives as a bigint of ns-since-epoch,
  which we convert to a proper timestamp (µs precision, floor) here.

Scale note: loaders return plain lazy DataFrames — no caching or driver
materialization — so Catalyst sees the parquet scan directly and pushdown /
pruning work. On a cluster the same code reads from any Hadoop-compatible
URI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns-since-epoch -> timestamp (µs, floored like DuckDB's ns handling)
        # integer div, not /: float division loses ulps on large ns values
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Fallback for sessions where spark.sql.parquet.inferTimestampNTZ.enabled
    # couldn't be flipped (it is runtime-settable, but the driver owns the
    # session): untagged TIMESTAMP(MICROS) then arrives as TIMESTAMP_NTZ,
    # which unix_micros/withWatermark reject. Under the UTC session timezone
    # this cast is a pure type retag — same instant, no value change — and
    # Catalyst folds it into the scan projection, so pushdown still works.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def footer_rows(sf_dir: str, name: str) -> "int | None":
    """Row count of ``{sf_dir}/{name}.parquet`` from parquet FOOTER
    metadata only — no Spark job, no data scan, O(#files) driver-side.

    Returns None when the path is not footer-readable (missing table,
    non-local filesystem without a pyarrow handler) so callers can fall
    back to a count() job — the shared helper behind the registry's
    plan-build row counts and the scale probe's sizing controls
    (self-review r12: two private copies had already drifted on
    fallback behavior)."""
    try:
        import pyarrow.dataset as _pads

        return _pads.dataset(f"{sf_dir}/{name}.parquet").count_rows()
    except Exception:
        return None
