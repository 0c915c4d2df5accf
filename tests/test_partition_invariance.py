"""Partition-geometry invariance sweep: every registry entry must return
IDENTICAL rows regardless of cluster geometry.

Each entry runs twice against sf0.001 — once at the suite's 4 shuffle
partitions with default 128 MB scan splits, once at a coprime 17 shuffle
partitions with 64 KB scan splits (multiplying input splits ~2000x) —
and the sorted row multisets are compared with exact ``repr`` equality
(floats to the last bit, no rounding tolerance).

Why this gate exists: local[32] at sf0.1 is a stand-in for a
1000-executor cluster at 100 TB, and the ONLY thing that provably
transfers is geometry-independent semantics. Anything order-dependent —
a double accumulation whose result depends on partition merge order
(the failure events_sessions' decimal accumulator was built for), a
first()/head() masquerading as an aggregate, a rank window
under-specified over its tie space — shows up as a diff between two
geometries long before it shows up as a wrong answer on a real cluster.
The conformance suites cannot catch this class: they compare against
DuckDB at ONE fixed geometry, so a geometry-dependent Spark answer that
happens to match at 4 partitions still diverges at 400.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

GEOMETRIES = [
    ("4", "134217728"),   # the suite default: few shuffles, fat splits
    ("17", "65536"),      # coprime shuffle count, ~2000x more scan splits
]

_QUERIES = entry_mod.queries()


@pytest.fixture()
def geometry_confs(spark):
    saved = {
        k: spark.conf.get(k)
        for k in ("spark.sql.shuffle.partitions", "spark.sql.files.maxPartitionBytes")
    }
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def _rows(spark, name, parts, mpb):
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
    df = _QUERIES[name](spark, SF_DIR)
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_entry_is_partition_invariant(spark, geometry_confs, name):
    (p1, m1), (p2, m2) = GEOMETRIES
    a = _rows(spark, name, p1, m1)
    b = _rows(spark, name, p2, m2)
    assert a == b, f"{name}: output depends on partition geometry"
