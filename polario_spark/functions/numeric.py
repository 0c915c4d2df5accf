"""Engine-independent numeric expression helpers.

Same doctrine as functions/text.py (ASCII tokenizer) and
functions/vector.py (zero-norm clamp): where the two engines' builtins
can legitimately differ on edge inputs, build ONE expression both
engines provably evaluate identically.
"""

from __future__ import annotations

#: Precision/scale for exact monetary/value accumulation. Doubles sum
#: order-dependently (parallel partial sums reorder), so every entry
#: whose oracle hash-checks a sum of values/prices accumulates in this
#: decimal type; |v| must be < 1e12 to be representable.
DECIMAL_SUM_TYPE = "DECIMAL(18,6)"


def safe_decimal(col: str) -> str:
    """Exact-decimal cast that survives corrupt numerics, identical SQL
    in Spark and DuckDB.

    A plain ``CAST(x AS DECIMAL(18,6))`` kills the whole job on the
    first NaN/Inf/1e308 row (both engines raise under ANSI semantics —
    the round-8 numeric-adversary probe lost ``events_sessions`` to a
    single injected 1e308). ``TRY_CAST`` alone is NOT engine-stable
    either: DuckDB v1.0.0 raises on ``TRY_CAST('nan'::DOUBLE AS
    DECIMAL)`` (out-of-range detection runs before the try guard) while
    Spark returns NULL. The explicit ``isnan`` guard plus ``TRY_CAST``
    yields NULL for NaN/±Inf/out-of-range in BOTH engines, so corrupt
    values drop out of the exact sum while the row itself keeps
    contributing to counts and session structure; plain NULLs pass
    through (``isnan(NULL)`` is NULL -> ELSE branch -> NULL).
    """
    return (
        f"CASE WHEN isnan(({col})) THEN NULL "
        f"ELSE TRY_CAST(({col}) AS {DECIMAL_SUM_TYPE}) END"
    )
