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
    first, then every entry lacking a green row in the committed
    correctness history, then the verified entries with the STALEST green
    row first — so the driver's per-round sample prefix rotates through
    old greens automatically."""
    from polario_spark import queries as Q

    order = list(Q.queries())
    assert set(order) == set(Q.REGISTRY), "ordering must drop/duplicate nothing"
    assert len(order) == len(set(order)), "ordering must not duplicate entries"
    assert len(Q._PRIORITY) == len(set(Q._PRIORITY)), "duplicate _PRIORITY entries"
    priority = [n for n in Q._PRIORITY if n in Q.REGISTRY]
    assert order[: len(priority)] == priority
    green = Q._latest_green_rounds()
    tail = order[len(priority):]
    never = [n for n in tail if n not in green]
    # every never-verified entry precedes every verified one
    assert tail[: len(never)] == never
    # the verified tail is sorted stalest-first
    rounds = [green[n] for n in tail[len(never):]]
    assert rounds == sorted(rounds)


def test_latest_green_rounds_predicate():
    """The staleness parser must treat rows-only checks (hash_match null)
    as green, but any recorded mismatch or error as not-green."""
    from polario_spark import queries as Q

    green = Q._latest_green_rounds()
    # entries green in CORRECTNESS_r06 must be present with round >= 6
    assert green.get("semantic_dedup", 0) >= 6
    assert green.get("q1_pricing_summary", 0) >= 1
    # the registry should have no entry whose history is all-red: every
    # registered entry either has a green row or sits in _PRIORITY
    unverified = set(Q.REGISTRY) - set(green) - set(Q._PRIORITY)
    assert unverified == set(), unverified
