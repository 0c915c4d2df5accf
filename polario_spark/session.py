"""SparkSession factory with the engine's required configuration.

The reference's dataset semantics (string-typed partition columns, dynamic
partition overwrite, snappy parquet, ≤N rows per output file — see
/root/reference/polario/hive_dataset.py:17-22,223-230,366-370) map to Spark
session confs set here once, instead of per-call logic.

Scale notes (100 TB design): AQE is enabled so shuffle partition counts,
skew-join splitting and join strategy are re-planned at runtime from real
statistics; on a 1000-executor cluster the same confs hold — only
``spark.sql.shuffle.partitions`` (the AQE *initial* value) and memory sizing
change with cluster size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Reference default: DEFAULT_ROWS_PER_FRAGMENT = int(1e6)
#: (/root/reference/polario/hive_dataset.py:17)
DEFAULT_ROWS_PER_FRAGMENT = 1_000_000


def get_spark(
    app_name: str = "polario_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for this engine.

    Local test default: ``local[$SPARK_GRAFT_CPUS]``. On a cluster, pass
    ``master=None`` with externally-provided master conf and a
    ``shuffle_partitions`` sized ~2-3x total cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # -- shuffle & adaptive execution -------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- oracle comparability ---------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # -- python <-> jvm transfer ------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- reference dataset-layout semantics -------------------------
        # partition values always read back as strings
        # (/root/reference/polario/hive_dataset.py:366-370)
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        # HiveDataset.write overwrites only the partitions present in the
        # input frame (/root/reference/polario/hive_dataset.py:412-415)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # snappy parquet (/root/reference/polario/hive_dataset.py:19-22)
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.parquet.mergeSchema", "false")
        # events.parquet carries INT64 TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects by default; read as ns-since-epoch longs and convert
        # in polario_spark.sources.tables.load_events
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # driver-regenerated testdata carries untagged TIMESTAMP(MICROS);
        # Spark 4 infers TIMESTAMP_NTZ for those by default, which
        # unix_micros/withWatermark reject. Read them as TIMESTAMP (UTC
        # session tz makes the instant identical to the old ns-long path).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        # local[32] runs 32 concurrent tasks inside the driver JVM; at 8g
        # each task slot gets ~75 MB of execution memory and heavy queries
        # pay GC instead of spilling usefully. The container has 128 GiB;
        # 32g keeps per-slot memory (~300 MB) comfortably above every
        # operator's working set at bench scale. Cluster deployments size
        # executor memory externally and never hit this default.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
