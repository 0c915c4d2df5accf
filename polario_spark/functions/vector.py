"""Portable vector (embedding) expression builders.

Embeddings are ``array<float>`` columns (the ``embeddings.parquet`` fixture
is 64-dim float32). All math is done at float64 after an explicit upcast so
Spark and DuckDB agree bit-for-bit at round(·, 4).

Spark side uses ``aggregate``/``zip_with`` higher-order functions — JVM-side,
codegen'd, no Python. At 100 TB these are per-row ops that scale linearly;
the pair-generation strategy (broadcast the query side, LSH-bucket the
corpus) is what controls cost, handled in operators/similarity.py.
"""

from __future__ import annotations


def dot(a: str, b: str, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
            f"cast(0.0 as double), (acc, v) -> acc + v)"
        )
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"


def norm(a: str, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"sqrt(aggregate({a}, cast(0.0 as double), "
            f"(acc, v) -> acc + cast(v as double) * cast(v as double)))"
        )
    return f"sqrt(list_dot_product(({a})::DOUBLE[], ({a})::DOUBLE[]))"


def cosine(a: str, b: str, dialect: str) -> str:
    if dialect == "duckdb":
        return f"list_cosine_similarity(({a})::DOUBLE[], ({b})::DOUBLE[])"
    return f"({dot(a, b, dialect)} / ({norm(a, dialect)} * {norm(b, dialect)}))"
