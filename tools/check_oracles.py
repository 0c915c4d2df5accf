"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB, compare row count, column names,
Arrow-level column TYPES, and order-insensitive values.

The round-1 driver hash check is type-sensitive: DuckDB typing a bare
integer sum() as HUGEINT (Arrow decimal128(38,0)) while Spark returns
int64 fails the hash even when every value compares equal. The previous
version of this gate stringified values (str(Decimal(5)) == str(5)) and
was blind to exactly that class. Now both result sets go through Arrow
and column types must match up to a small allowlist of equivalences the
driver demonstrably accepts (timestamp tz annotation, string vs
large_string), which value-hash identically.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from polario_spark import get_spark  # noqa: E402
from polario_spark.queries import _GATE_SF_DIR  # noqa: E402
from polario_spark.sources.tables import TABLES  # noqa: E402
from polario_spark.workdir import rebind_stable_paths  # noqa: E402


def _canon_type(t: pa.DataType) -> str:
    """Canonical type name; collapses ONLY equivalences that hash the same.

    Spark exports timestamps as timestamp[us, tz=UTC] (session tz) where
    DuckDB yields timestamp[us]; both render the same wall-clock value once
    collected, and round-1 driver runs accepted them (events_hourly et al.
    passed hash). Integer WIDTHS are likewise driver-equivalent — round 1
    green rows include int8-vs-int64 (cube_sales grouping flags) and
    int32-vs-int64 (order_rank_window rn, ann_topk rank): Python ints hash
    identically whatever the Arrow width. What the driver does NOT accept
    is a kind change — decimal vs int (HUGEINT sums, the round-1 failure
    class), decimal vs float, int vs float — so those stay strict.
    """
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{_canon_type(t.value_type)}>"
    if pa.types.is_integer(t):
        return "int"
    return str(t)


def _type_map(tbl: pa.Table) -> dict[str, str]:
    return {f.name: _canon_type(f.type) for f in tbl.schema}


def normalize(rows, columns):
    """Sort columns by name, stringify values the way a hasher would."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # IEEE -0.0 is deliberately NOT collapsed: the driver's hash
            # may be sign-strict, so queries must normalize (+ 0.0) on
            # both sides rather than rely on comparator leniency
            return f"{v:.6f}"
        return str(v)

    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stbl = sdf.toArrow()
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows")
            continue
        try:
            # round 14: stable artifacts are corpus-keyed — rebind the
            # baked gate-corpus path literals to where THIS sf_dir's run
            # writes (no-op at the gate corpus and for path-free oracles)
            rel = con.sql(
                rebind_stable_paths(oracles[name], _GATE_SF_DIR, sf_dir)
            )
            dtbl = rel.arrow()
            dcols = list(dtbl.schema.names)
            drows = [
                tuple(d[c] for c in dcols) for d in dtbl.to_pylist()
            ]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {str(exc)[:200]}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        stypes, dtypes = _type_map(stbl), _type_map(dtbl)
        mistyped = {
            c: (stypes[c], dtypes[c]) for c in stypes if stypes[c] != dtypes[c]
        }
        if mistyped:
            failures.append(name)
            print(f"FAIL  {name}: column types differ (spark, duck): {mistyped}")
            continue
        sn, dn = normalize(srows, scols), normalize(drows, dcols)
        if len(sn) != len(dn):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sn)} duck={len(dn)}")
            continue
        if sn != dn:
            failures.append(name)
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL  {name}: values differ, first diffs: {diff}")
            continue
        print(f"OK    {name}: {len(sn)} rows")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
