"""The local correctness gate must be at least as strict as the driver's.

Round-1 failure mode: DuckDB types a bare integer ``sum()`` as HUGEINT
(Arrow decimal128(38,0)) while Spark returns int64; the driver's hash is
type-sensitive, but the old local gate stringified values and passed.
These tests pin the gate's type canonicalization: kind changes (decimal
vs int) are flagged, while width/annotation differences the driver
demonstrably accepts (int8/int32/int64, timestamp tz) are collapsed.
"""

from __future__ import annotations

import importlib.util
import pathlib

import duckdb
import pyarrow as pa

_spec = importlib.util.spec_from_file_location(
    "check_oracles",
    pathlib.Path(__file__).resolve().parents[1] / "tools" / "check_oracles.py",
)
check_oracles = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracles)
_canon = check_oracles._canon_type


def test_injected_hugeint_sum_is_flagged():
    """A bare integer sum() from DuckDB (HUGEINT -> decimal128) must not
    canonicalize to int64 — this is exactly the class the round-1 driver
    failed 6 queries on."""
    con = duckdb.connect()
    tbl = con.sql("SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)").arrow()
    hugeint_type = tbl.schema.field("s").type
    assert pa.types.is_decimal(hugeint_type)
    assert _canon(hugeint_type) != _canon(pa.int64())


def test_driver_equivalent_widths_collapse():
    # integer widths hash identically as Python ints (round-1 green rows
    # include int8-vs-int64 and int32-vs-int64 columns)
    assert _canon(pa.int8()) == _canon(pa.int64()) == _canon(pa.int32())
    # Spark exports session-tz timestamps; DuckDB exports naive ones
    assert _canon(pa.timestamp("us", tz="UTC")) == _canon(pa.timestamp("us"))
    # but kind changes never collapse
    assert _canon(pa.float64()) != _canon(pa.int64())
    assert _canon(pa.decimal128(18, 2)) != _canon(pa.float64())
    assert _canon(pa.timestamp("us")) != _canon(pa.timestamp("ns"))


def test_driver_ordering_puts_unverified_entries_first():
    """queries() iteration order is load-bearing: the driver verifies only
    a prefix of the registry per round. Assert the *invariant*, not any
    round-specific list contents: explicitly re-prioritized entries come
    first, then every entry lacking a driver-green row, and only then the
    entries already green for their current code."""
    from polario_spark import queries as Q

    order = list(Q.queries())
    assert set(order) == set(Q.REGISTRY), "ordering must drop/duplicate nothing"
    assert len(order) == len(set(order)), "ordering must not duplicate entries"
    assert len(Q._PRIORITY) == len(set(Q._PRIORITY)), "duplicate _PRIORITY entries"
    priority = [n for n in Q._PRIORITY if n in Q.REGISTRY]
    assert order[: len(priority)] == priority
    green = {n for n in Q._DRIVER_GREEN if n in Q.REGISTRY} - set(priority)
    pos = {n: i for i, n in enumerate(order)}
    nongreen = [n for n in order[len(priority):] if n not in green]
    if nongreen and green:
        assert max(pos[n] for n in nongreen) < min(pos[n] for n in green)
