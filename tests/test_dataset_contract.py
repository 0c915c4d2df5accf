"""Backend-parametrized dataset contract suite.

The reference runs one suite over both HiveDataset and DeltaDataset
(/root/reference/tests/test_dataset.py:42-48). Here the backends are
HiveDataset and ParquetTableDataset (DeltaDataset joins when delta-spark
jars are present — it shares ParquetTableDataset's code path).
"""

from __future__ import annotations

import pytest

from polario_spark import HiveDataset, ParquetTableDataset, unwrap
from polario_spark.delta_dataset import HAS_DELTA

from tests.conftest import comparable_rows

BACKENDS = [HiveDataset, ParquetTableDataset]
if HAS_DELTA:  # pragma: no cover - jars not in the v1 container
    from polario_spark import DeltaDataset

    BACKENDS.append(DeltaDataset)


@pytest.fixture(params=BACKENDS)
def dataset(request, spark, tmp_path):
    return request.param(spark, str(tmp_path / "ds"), ["p1", "p2"])


def test_roundtrip_contract(dataset, example_df_1):
    dataset.write(example_df_1)
    out = unwrap(dataset.scan())
    assert set(out.columns) == {"p1", "p2", "v"}
    vals = comparable_rows(out.select("p1", "p2", "v"))
    assert vals == sorted(
        [("1", "a", 1), ("1", "b", 1), ("2", "a", 1), ("2", "a", 2)], key=repr
    )


def test_overwrite_idempotent_contract(dataset, example_df_1):
    dataset.write(example_df_1)
    dataset.write(example_df_1)
    assert unwrap(dataset.scan()).count() == 4


def test_append_contract(dataset, example_df_1):
    dataset.write(example_df_1)
    for _ in range(10):
        dataset.append(example_df_1)
    assert unwrap(dataset.scan()).count() == 44


def test_empty_scan_none_contract(dataset):
    assert dataset.scan() is None


def test_partition_only_frame_rejected_contract(dataset, spark):
    df = spark.createDataFrame([("1", "a")], schema="p1 string, p2 string")
    with pytest.raises(ValueError):
        dataset.write(df)
    with pytest.raises(ValueError):
        dataset.append(df)


def test_read_partition_contract(dataset, example_df_1):
    dataset.write(example_df_1)
    part = unwrap(dataset.read_partition({"p1": "2", "p2": "a"}))
    assert sorted(r.v for r in part.collect()) == [1, 2]
    with pytest.raises(ValueError):
        dataset.read_partition({"p1": "2"})


def test_full_vs_dynamic_overwrite_semantics(spark, tmp_path, example_df_1):
    """HiveDataset.write = dynamic partition overwrite; table datasets
    (Delta parity) = full-table overwrite."""
    update = spark.createDataFrame(
        [("1", "a", 99)], schema="p1 string, p2 string, v long"
    )
    hive = HiveDataset(spark, str(tmp_path / "hive"), ["p1", "p2"])
    hive.write(example_df_1)
    hive.write(update)
    assert unwrap(hive.scan()).count() == 4  # 3 partitions kept + 1 replaced

    table = ParquetTableDataset(spark, str(tmp_path / "table"), ["p1", "p2"])
    table.write(example_df_1)
    table.write(update)
    assert unwrap(table.scan()).count() == 1  # full overwrite


def test_append_only_accumulation_contract(dataset, example_df_1):
    """10-append accumulation (reference tests/test_dataset.py:132-145):
    appending ten times to a dataset that was NEVER written yields exactly
    10x the rows with the same column set — append must bootstrap an empty
    dataset, not only extend an existing one (the companion
    test_append_contract covers the written-first path)."""
    for _ in range(10):
        dataset.append(example_df_1)
    out = unwrap(dataset.scan())
    assert len(out.columns) == len(example_df_1.columns)
    assert out.count() == example_df_1.count() * 10


def test_write_back_partitions_contract(dataset, spark, example_df_1):
    """Write-back stability (reference tests/test_dataset.py:118-129):
    re-writing a dataset from its own read must reproduce the same rows.
    HiveDataset writes each partition frame back individually (dynamic
    overwrite makes per-partition write-back stable); full-overwrite table
    datasets write back the whole scan in one call — the stability
    property each backend actually guarantees."""
    dataset.write(example_df_1)
    before = comparable_rows(unwrap(dataset.scan()).select("p1", "p2", "v"))
    # The reference's read_partitions yields EAGER Polars frames, so its
    # write-back never reads the files it is overwriting. Lazy Spark
    # frames would hit the classic self-overwrite failure here
    # (FAILED_READ_FILE mid-commit) — write() detects the overlap via
    # inputFiles() and inserts the materialization barrier itself
    # (hive_dataset.materialize_if_self_read), so plain write-back of a
    # frame read from the same dataset must just work.
    if isinstance(dataset, HiveDataset):
        for partition in dataset.read_partitions():
            dataset.write(partition)
    else:
        dataset.write(unwrap(dataset.scan()))
    after = comparable_rows(unwrap(dataset.scan()).select("p1", "p2", "v"))
    assert after == before


def test_null_and_empty_partition_values_refused(dataset, spark):
    """Spark's partitioned writer silently rewrites NULL and '' partition
    values to __HIVE_DEFAULT_PARTITION__ (reads back as NULL). Both
    backends must refuse such rows loudly inside the write job instead
    of corrupting them — and a subsequent scan must show nothing was
    written by the failed job that survives the contract."""
    bad_empty = spark.createDataFrame([(1, "", "a")], "v long, p1 string, p2 string")
    bad_null = spark.createDataFrame([(1, None, "a")], "v long, p1 string, p2 string")
    for bad in (bad_empty, bad_null):
        with pytest.raises(Exception, match="NULL or empty"):
            dataset.write(bad)
        with pytest.raises(Exception, match="NULL or empty"):
            dataset.append(bad)
    good = spark.createDataFrame([(1, "x", "a")], "v long, p1 string, p2 string")
    dataset.write(good)
    assert unwrap(dataset.scan()).count() == 1
