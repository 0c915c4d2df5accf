"""Scratch-dir lifecycle: repeated invocation must not invalidate frames."""

from __future__ import annotations

from polario_spark import queries as Q
from polario_spark.workdir import work_dir


def test_work_dir_gives_fresh_path_per_invocation(spark):
    a = work_dir(spark, "unit-kind")
    b = work_dir(spark, "unit-kind")
    assert a != b
    import os

    assert os.path.isdir(a) and os.path.isdir(b)


def test_reinvoking_entry_keeps_first_frame_collectable(spark):
    """bench min-of-N re-invokes each registry entry in one session; the
    second invocation's scratch write must not delete the files a
    still-uncollected first frame reads from."""
    first = Q.csv_roundtrip(spark, "/root/testdata/sf0.001")
    second = Q.csv_roundtrip(spark, "/root/testdata/sf0.001")
    assert second.count() > 0
    assert first.count() > 0  # collected AFTER the second invocation wrote
