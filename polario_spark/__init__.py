"""polario_spark — a PySpark-native dataset + analytics engine.

Reimplements the capability surface of the reference library
(``bneijt/polario``: Hive-partitioned Parquet / Delta dataset layer over a
host DataFrame engine — see ``/root/reference/polario/hive_dataset.py``)
Spark-first, and extends it with large-scale analytics and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns,
streaming) designed for a multi-executor cluster at 100 TB scale.

The engine returns real ``pyspark.sql.DataFrame`` objects, so the entire
Spark relational surface (joins, aggregations, windows, SQL) is available on
every result — mirroring how the reference returns Polars frames.
"""

from __future__ import annotations

from typing import Optional, TypeVar

__version__ = "0.1.0"

T = TypeVar("T")


def unwrap(value: Optional[T], error_message: str = "Expected a value, got None") -> T:
    """Unwrap an Optional, raising ValueError on None.

    Parity with the reference ``unwrap`` helper
    (/root/reference/polario/__init__.py:12-26): dataset ``scan``/``read``
    methods return ``None`` for empty datasets; ``unwrap`` converts that into
    an exception for callers that require data.
    """
    if value is None:
        raise ValueError(error_message)
    return value


from polario_spark.hive_dataset import HiveDataset  # noqa: E402
from polario_spark.delta_dataset import DeltaDataset, ParquetTableDataset  # noqa: E402
from polario_spark.session import get_spark  # noqa: E402

__all__ = [
    "unwrap",
    "HiveDataset",
    "DeltaDataset",
    "ParquetTableDataset",
    "get_spark",
    "__version__",
]
