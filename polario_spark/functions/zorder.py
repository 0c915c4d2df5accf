"""Z-order (Morton) clustering key for multi-dimensional data skipping.

Sorting a table by one column gives parquet min/max pruning on that column
only; interleaving the bits of several normalized columns gives pruning on
ALL of them at once (each file covers a small hyper-rectangle of the key
space). This is the layout optimization behind Delta OPTIMIZE ZORDER BY /
Iceberg sort orders, built here from pure Spark column expressions — the
whole key computation stays inside whole-stage codegen, no UDFs.

Usage::

    zdf = zorder_frame(df, ["l_orderkey", "l_partkey"])
    dataset.write(zdf.orderBy("__zkey").drop("__zkey"))          # global
    # or: dataset.write(df, sort_by=[...]) after adding the key column

Net-new surface (no reference analog — polario has no layout optimizer);
designed for the 100 TB case where a full sort is one shuffle and every
later scan prunes on any clustered column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: max bits per dimension. The interleaved key must stay clear of the
#: sign bit of a signed 64-bit long: the top bit of dim i lands at
#: position (bits-1)*ndim + i, so ndim * bits <= 63 is required (16 x 4
#: = 64 would push dim 3's top bit to position 63 and produce NEGATIVE
#: keys that sort before all positive ones, breaking Morton order).
#: _effective_bits() caps accordingly: 16 for 2-3 dims, 15 for 4.
BITS = 16


def _effective_bits(ndim: int) -> int:
    return min(BITS, 63 // ndim)

# magic-number bit spreads: 16 relevant bits -> 64 with (ndim-1)-zero gaps.
# Standard morton-code constants for 2-way interleave; the 3/4-way cases
# fall back to a per-bit loop (still pure column expressions).
_SPREAD2 = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_2way(c: Column) -> Column:
    for shift, mask in _SPREAD2:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def _spread_nway(c: Column, ndim: int, bits: int) -> Column:
    """Generic bit spread: bit i of c moves to position i*ndim."""
    parts = [
        F.shiftleft(
            F.shiftright(c, i).bitwiseAND(F.lit(1)), i * ndim
        )
        for i in range(bits)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def _bucket(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Normalize a numeric column into [0, 2^bits) using per-dataset
    bounds. Constant columns (hi == lo) map to bucket 0."""
    max_bucket = (1 << bits) - 1
    span = hi - lo
    scaled = F.when(
        span > 0,
        ((col.cast("double") - lo) / span * max_bucket),
    ).otherwise(F.lit(0.0))
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)),
        F.lit(max_bucket),
    )


def morton_key(cols: list[Column], bounds: list[tuple[Column, Column]]) -> Column:
    """Interleave the bits of the normalized columns into one long key.

    ``bounds[i]`` is the (min, max) pair for ``cols[i]`` — pass literals
    or columns attached via a broadcast of the one-row bounds aggregate.
    """
    ndim = len(cols)
    if not 2 <= ndim <= 4:
        raise ValueError("morton_key supports 2-4 dimensions")
    bits = _effective_bits(ndim)
    spread = (
        _spread_2way if ndim == 2 else (lambda c: _spread_nway(c, ndim, bits))
    )
    key = None
    for i, (col, (lo, hi)) in enumerate(zip(cols, bounds)):
        part = F.shiftleft(spread(_bucket(col, lo, hi, bits)), i)
        key = part if key is None else key.bitwiseOR(part)
    return key


def zorder_frame(df: DataFrame, columns: list[str], key: str = "__zkey") -> DataFrame:
    """Attach a Morton key over ``columns``, computing the normalization
    bounds with one tiny aggregate broadcast back onto every row (no
    driver collect — the bounds travel inside the plan)."""
    aggs = []
    for c in columns:
        aggs.append(F.min(c).cast("double").alias(f"__lo_{c}"))
        aggs.append(F.max(c).cast("double").alias(f"__hi_{c}"))
    bounds_df = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(bounds_df))
    key_col = morton_key(
        [F.col(c) for c in columns],
        [(F.col(f"__lo_{c}"), F.col(f"__hi_{c}")) for c in columns],
    )
    drop = [f"__lo_{c}" for c in columns] + [f"__hi_{c}" for c in columns]
    return joined.withColumn(key, key_col).drop(*drop)
