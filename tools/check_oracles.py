"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB, compare row count, column names,
and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from polario_spark import get_spark  # noqa: E402
from polario_spark.sources.tables import TABLES  # noqa: E402


def normalize(rows, columns):
    """Sort columns by name, stringify values the way a hasher would."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # collapse -0.0/0.0 and float repr noise
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
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            drows = rel.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {str(exc)[:200]}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
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
