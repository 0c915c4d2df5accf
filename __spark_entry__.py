"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query at sf0.001; ``queries``/``oracle_sql``
expose the full registry from polario_spark.queries — one entry per
implemented operator (SURVEY.md §2 + LLM-pipeline extensions), each with a
DuckDB-runnable ANSI-SQL oracle unless genuinely non-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from polario_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _apply_session_conf(spark)
    return Q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = Q.queries()
    return {name: _wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _apply_session_conf(spark)
        return fn(spark, sf_dir)

    return run


def _apply_session_conf(spark: SparkSession) -> None:
    """The driver owns the SparkSession; set the confs our readers rely on
    (ns-timestamp handling, UTC, dynamic partition overwrite)."""
    for key, value in {
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # untagged parquet TIMESTAMP(MICROS) must read as TIMESTAMP, not
        # TIMESTAMP_NTZ (unix_micros/withWatermark reject NTZ); with the
        # UTC session tz the instant is identical either way
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
        "spark.sql.adaptive.enabled": "true",
    }.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # static conf on a live session; reader-level fallbacks apply
