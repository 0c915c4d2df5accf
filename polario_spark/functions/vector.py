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


# A statically-unrolled dot (a[0]*b[0] + a[1]*b[1] + ... behind a size
# guard) was tried for the hot nearest-centroid assignment and REVERTED
# with data: despite entering whole-stage codegen it measured 3.5x
# SLOWER than the aggregate/zip_with fold on the 100x volume-probe
# corpus (93.5 s vs 26.9 s, bitwise-equal checksums) — 128 per-pair
# bounds-checked UnsafeArrayData element reads plus a 64-term generated
# expression lose to the fold's single pass over primitive arrays.
# Keep the fold; see SCALE.md "interpreted-HOF dot" for the record.


def norm(a: str, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"sqrt(aggregate({a}, cast(0.0 as double), "
            f"(acc, v) -> acc + cast(v as double) * cast(v as double)))"
        )
    return f"sqrt(list_dot_product(({a})::DOUBLE[], ({a})::DOUBLE[]))"


#: Cosine denominator clamp. An all-zero embedding has norm 0, so an
#: unguarded cosine is 0/0 = NaN — and BOTH engines order NaN above every
#: real number (Spark's ordering and DuckDB's total order), so a zero
#: vector would silently win top-k ranks and pass `sim >= threshold`
#: pair filters. The numpy GEMM kernels already clamp norms to 1e-12 so
#: zero vectors score exactly 0 (dot = 0) and never pair; this makes the
#: Spark expressions and DuckDB oracles follow the same convention. For
#: any real embedding (norm >> 1e-12) the clamp is the identity, so all
#: existing results are bitwise unchanged.
NORM_EPS = "1e-12"


def norm_clamped(a: str, dialect: str) -> str:
    """``norm`` clamped to NORM_EPS — use when binding a cosine
    denominator; use plain ``norm`` when the norm itself is the result
    (e.g. embedding_norm_stats must report 0 for a zero vector)."""
    return f"greatest({norm(a, dialect)}, {NORM_EPS})"


def cosine(a: str, b: str, dialect: str) -> str:
    if dialect == "duckdb":
        # keep list_cosine_similarity for the well-formed case (bitwise
        # parity with the Spark quotient at round(,4) is established);
        # the CASE reroutes the whole CLAMP REGION — any norm < NORM_EPS,
        # not just exactly-zero vectors — to the clamped quotient. A
        # denormal-component vector (all 1e-45f: norm ~8e-45, a real
        # failure mode of fp16/fp32 embedding jobs) has a NONZERO dot
        # with itself, so the old `dot = 0` test let
        # list_cosine_similarity normalize it to sim 1.0 while the
        # Spark/numpy side (norms clamped to NORM_EPS everywhere —
        # operators/similarity.py GEMM kernels and the spark branch
        # below) scores it ~1e-65: ten silent extra oracle pairs on the
        # round-9 denormal probe (tests/test_vector_magnitude_adversaries).
        # Inside the reroute branch the full clamped quotient is used, so
        # the routing threshold itself need not split bitwise-identically
        # with Spark: at any norm >= NORM_EPS the clamp is the identity
        # and both branches compute the same quotient.
        return (
            f"(CASE WHEN sqrt(list_dot_product(({a})::DOUBLE[], ({a})::DOUBLE[])) < {NORM_EPS} "
            f"OR sqrt(list_dot_product(({b})::DOUBLE[], ({b})::DOUBLE[])) < {NORM_EPS} "
            f"THEN ({dot(a, b, dialect)} / "
            f"({norm_clamped(a, dialect)} * {norm_clamped(b, dialect)})) "
            f"ELSE list_cosine_similarity(({a})::DOUBLE[], ({b})::DOUBLE[]) END)"
        )
    return (
        f"({dot(a, b, dialect)} / "
        f"({norm_clamped(a, dialect)} * {norm_clamped(b, dialect)}))"
    )
