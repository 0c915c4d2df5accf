"""Round-8 numeric-adversary suite: NaN / ±Inf / 1e308 / NULL injected
into the value and price columns, with every exact-decimal-accumulating
entry re-verified against its DuckDB oracle on the poisoned data.

What the probe originally found: a single injected 1e308 in
events.value killed `events_sessions` outright — `CAST(x AS
DECIMAL(18,6))` raises in BOTH engines under ANSI semantics, so one
corrupt telemetry row failed the whole job. And the obvious fix is NOT
engine-stable: DuckDB v1.0.0 raises on `TRY_CAST('nan'::DOUBLE AS
DECIMAL)` (its range check runs before the try guard) while Spark
returns NULL. `functions.numeric.safe_decimal` is the construction both
engines agree on (explicit isnan guard + TRY_CAST): corrupt values drop
out of the exact sum while their rows keep contributing to counts,
session structure, and window frames.

Entries that sum doubles directly (events_hourly, foreachbatch totals,
...) pass the probe unchanged: NaN/Inf propagate identically in both
engines, so no guard is added there — excluding rows an operator can
represent would discard information.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from polario_spark.sources.tables import TABLES

CLEAN_SF = "/root/testdata/sf0.001"

# entry -> which poisoned table drives it
AFFECTED = [
    "events_sessions",           # events.value
    "customer_running_totals",   # orders.o_totalprice (window sums)
    "orders_seasonality",        # orders.o_totalprice (group sums)
    "q11_important_parts",       # lineitem revenue expression
    "events_hourly",             # double-sum family: NaN/Inf flow through
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_num")
    for t in TABLES:
        if t not in ("events", "orders", "lineitem"):
            os.symlink(f"{CLEAN_SF}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{CLEAN_SF}/events.parquet')
  UNION ALL
  SELECT * FROM (VALUES
    (9300001, TIMESTAMP '2024-01-05 01:00:00', 31, 'click', 'NaN'::DOUBLE,       NULL),
    (9300002, TIMESTAMP '2024-01-05 02:00:00', 32, 'view',  'Infinity'::DOUBLE,  NULL),
    (9300003, TIMESTAMP '2024-01-05 03:00:00', 33, 'buy',   '-Infinity'::DOUBLE, NULL),
    (9300004, TIMESTAMP '2024-01-05 04:00:00', 34, 'click', 1e308,               NULL),
    (9300005, TIMESTAMP '2024-01-05 05:00:00', 35, 'view',  NULL,                NULL)
  ) v(event_id, ts, user_id, event_type, value, props)
) TO '{d}/events.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * REPLACE (
    CASE WHEN o_orderkey % 97 = 0 THEN 'NaN'::DOUBLE
         WHEN o_orderkey % 98 = 1 THEN 'Infinity'::DOUBLE
         WHEN o_orderkey % 99 = 2 THEN 1e308
         ELSE o_totalprice END AS o_totalprice)
  FROM read_parquet('{CLEAN_SF}/orders.parquet')
) TO '{d}/orders.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * REPLACE (
    CASE WHEN l_orderkey % 97 = 0 THEN 'NaN'::DOUBLE
         WHEN l_orderkey % 98 = 1 THEN '-Infinity'::DOUBLE
         ELSE l_extendedprice END AS l_extendedprice)
  FROM read_parquet('{CLEAN_SF}/lineitem.parquet')
) TO '{d}/lineitem.parquet' (FORMAT PARQUET)
""")
    return str(d)


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{adv_dir}/{t}.parquet')"
        )
    return con


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", AFFECTED)
def test_decimal_entries_survive_numeric_poison(spark, adv_dir, adv_duck, name):
    fn = entry_mod.queries()[name]
    oracle = entry_mod.oracle_sql()[name]
    sdf = fn(spark, adv_dir)
    rel = adv_duck.sql(oracle)
    assert sorted(sdf.columns) == sorted(rel.columns)
    srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    drows = _normalize(rel.fetchall(), list(rel.columns))
    assert len(srows) == len(drows), name
    assert srows == drows, name


def test_safe_decimal_expression_parity():
    """The shared safe_decimal string must evaluate identically in both
    engines on every edge value — NULL for NaN/±Inf/out-of-range, exact
    decimal otherwise."""
    from polario_spark.functions.numeric import safe_decimal

    con = duckdb.connect()
    vals = "unnest(['nan','inf','-inf','1e308','1e12','-1e12','1e11','123.456789','0'])"
    got = con.execute(
        f"SELECT CAST({safe_decimal('x')} AS VARCHAR) FROM "
        f"(SELECT {vals}::DOUBLE AS x)"
    ).fetchall()
    assert [g[0] for g in got] == [
        None, None, None, None, None, None,
        "100000000000.000000", "123.456789", "0.000000",
    ]
