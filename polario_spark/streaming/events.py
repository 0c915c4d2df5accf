"""Structured Streaming operators over the events table.

The events fixture is a batch parquet file; these operators read it through
``readStream`` (file source) so the streaming plan — watermarks, windowed
state, memory sink — is the real one. On a cluster the source swaps for
Kafka/kinesis with the same downstream plan.

``hourly_counts`` runs a tumbling-window aggregate to completion with an
availableNow-style drain and returns the result as a batch DataFrame, so
the driver's oracle can compare it against plain batch SQL — the streaming
plan must produce byte-identical results to the batch plan.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # file streaming source needs an explicit schema; take it from a batch
    # read of the same file (ts arrives as ns-since-epoch bigint, see
    # polario_spark.sources.tables)
    # the file streaming source requires a directory; point it at sf_dir
    # with a glob filter selecting only the events file
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts/sums per event_type, via a real
    streaming query drained to a memory sink.

    Watermark bounds state at 1 hour; outputMode=complete emits every
    window, so the finite fixture matches batch semantics exactly.
    """
    agg = (
        _event_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    name = f"hourly_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.table(name).select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "n_events",
        "sum_value",
    )
