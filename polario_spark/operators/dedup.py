"""Deduplication operators for document corpora, Spark-first.

Four families, each a composition of built-in DataFrame ops (no Python
UDFs anywhere — everything stays in whole-stage codegen):

- **exact** — keep the lexicographically-first row per key (deterministic,
  unlike ``dropDuplicates`` whose survivor depends on partition order).
- **content fingerprint** — md5 over the sorted distinct token set; exact
  dedup of token-set-identical documents regardless of word order.
- **MinHash + LSH** — k universal hashes over the word-bigram shingle set, banded into
  groups; documents sharing any band bucket become candidate pairs. The
  classic near-dup pipeline (Broder '97; the same shape as Spark MLlib's
  MinHashLSH, reimplemented here with portable md5-based hashing so a SQL
  oracle can verify it).
- **SimHash** — 32-bit per-document signature from per-token hash bit
  votes (Charikar '02); equal signatures => near-identical token multisets.

Scale notes (100 TB): every stage is explode -> groupBy-doc (map-side
combinable) or a band-key equi-join. Band buckets are the only skew risk —
identical boilerplate docs pile into one bucket; cap bucket size upstream
(filter giant buckets, they are degenerate "everything matches" groups) or
enable AQE skew-join, which the session config does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polario_spark.functions import text as TXT

#: MinHash configuration: 12 hashes in 4 bands of 3 rows.
#: P(candidate | jaccard j) = 1 - (1 - j^3)^4 — ~0.9 at j=0.8, ~0.07 at j=0.25.
MINHASH_K = 12
MINHASH_BANDS = 4
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS
MINHASH_COEFFS = TXT.hash_coefficients(MINHASH_K)

#: candidates below this estimated Jaccard are band-collision noise; on
#: small-vocabulary corpora the bands alone are too permissive, so the
#: pair output is post-filtered on the signature-agreement estimate.
MINHASH_MIN_EST_SIM = 0.8

SIMHASH_BITS = 32


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep exactly one row per key: the one with the smallest id.

    Deterministic alternative to ``df.dropDuplicates(key_cols)``. Executes
    as a single hash-aggregate / window over the key shuffle.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def content_fingerprint(df: DataFrame, text_col: str) -> DataFrame:
    """Add a ``fingerprint`` column: md5 of the sorted distinct token set."""
    toks = TXT.sorted_distinct_tokens(text_col, "spark")
    return df.withColumn(
        "fingerprint", F.expr(f"md5({TXT.array_join(toks, ' ', 'spark')})")
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per document with columns mh0..mh{k-1} (the MinHash signature).

    explode(distinct tokens) -> per-token base hash -> k min-aggregates.
    The groupBy is map-side combinable: the shuffle carries one partial
    signature per document per task, not per token.
    """
    shingles = (
        f"array_distinct({TXT.word_bigrams(TXT.tokens(text_col, 'spark'), 'spark')})"
    )
    exploded = df.select(
        F.col(id_col), F.explode(F.expr(shingles)).alias("__tok")
    ).withColumn("__h", F.expr(TXT.md5_int32("__tok", "spark")))
    aggs = [
        F.min(F.expr(TXT.universal_hash(i, "__h", MINHASH_COEFFS))).alias(f"mh{i}")
        for i in range(MINHASH_K)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_candidate_pairs(sig: DataFrame, id_col: str) -> DataFrame:
    """LSH banding as ONE join: explode each signature into its band rows
    (band_idx, band values), self-equi-join on the band, distinct the
    pairs, then join the signature table back twice for the agreement
    estimate.

    Returns (id_a, id_b, est_sim): est_sim = fraction of the k minhashes
    that agree — an unbiased estimate of Jaccard similarity.

    Scale: the naive formulation (union of per-band self-joins) recomputes
    the signature pipeline 2 x bands times; this shape computes it once
    for the band explode and twice for the estimate join-back, and the
    only shuffled objects are (id, band) rows and the candidate id pairs.
    Band buckets are the skew risk (boilerplate-identical docs); AQE
    skew-join splits hot buckets.
    """
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("bidx"),
                *[
                    F.col(f"mh{band * MINHASH_ROWS + r}").alias(f"v{r}")
                    for r in range(MINHASH_ROWS)
                ],
            )
            for band in range(MINHASH_BANDS)
        ]
    )
    bands = sig.select(F.col(id_col), F.explode(band_structs).alias("__b"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__b") == F.col("b.__b"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sa = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh{i}").alias(f"__a{i}") for i in range(MINHASH_K)],
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh{i}").alias(f"__b{i}") for i in range(MINHASH_K)],
    )
    est = (
        sum(
            F.when(F.col(f"__a{i}") == F.col(f"__b{i}"), 1).otherwise(0)
            for i in range(MINHASH_K)
        )
        / F.lit(float(MINHASH_K))
    ).alias("est_sim")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", est)
        .filter(F.col("est_sim") >= MINHASH_MIN_EST_SIM)
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Add a 32-bit ``simhash`` signature per document.

    Bit j of the signature is the majority vote of bit j across the md5
    hashes of the document's distinct tokens. Computed as 32 conditional
    sums in ONE aggregate pass (no 32x row blowup).
    """
    toks = TXT.distinct_tokens(text_col, "spark")
    exploded = df.select(
        F.col(id_col), F.explode(F.expr(toks)).alias("__tok")
    ).withColumn("__h", F.expr(TXT.md5_int32("__tok", "spark")))
    votes = [
        F.sum(
            F.expr(f"case when (__h div {1 << j}) % 2 = 1 then 1 else -1 end")
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = exploded.groupBy(id_col).agg(*votes)
    value = sum(
        F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(SIMHASH_BITS)
    )
    return per_doc.select(F.col(id_col), value.cast("long").alias("simhash"))


#: rolling-window fingerprint configuration: tokens per window, minimum
#: shared windows for a candidate pair.
ROLLING_WINDOW = 8
ROLLING_MIN_SHARED = 5


def rolling_window_pairs(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Chunk-level near-dup pairs via rolling-window fingerprints.

    Each doc is reduced to its stream of w-token window hashes
    (Rabin-Karp/winnowing chunking); documents sharing >=
    ``ROLLING_MIN_SHARED`` distinct window hashes are emitted with the
    shared count. Order-sensitive — catches copied passages that token-set
    fingerprints miss. Same co-occurrence-join shape as the Jaccard
    operator: shuffle is postings, never the pair space; 8-token windows
    are near-unique, so posting lists stay short and the join stays
    near-linear even at corpus scale.
    """
    from polario_spark.plans.parallelism import ensure_parallelism

    df = ensure_parallelism(df)
    # bind the token array: window_hashes slices it inside a transform
    # lambda, which re-tokenizes per window position if inlined
    bound = df.withColumns(
        {"__toks": F.expr(TXT.tokens(text_col, "spark"))}
    )
    wins = F.expr(
        "array_distinct("
        + TXT.window_hashes(text_col, ROLLING_WINDOW, "spark", toks_col="__toks")
        + ")"
    )
    postings = bound.select(F.col(id_col), F.explode(wins).alias("__wh"))
    a, b = postings.alias("a"), postings.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__wh") == F.col("b.__wh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_windows"))
        .filter(F.col("shared_windows") >= ROLLING_MIN_SHARED)
    )


def connected_components(
    pairs: DataFrame, max_iterations: int = 25
) -> DataFrame:
    """Dedup-cluster assignment: connected components over a near-dup pair
    graph via iterative min-label propagation.

    ``pairs`` is any (id_a, id_b) candidate-pair frame (MinHash, SimHash,
    rolling-window, ...). Returns (node, component) where component is the
    smallest doc id reachable through the pair graph — the canonical
    representative every duplicate collapses to.

    Each iteration is one join + one map-side-combinable min-agg; labels
    are localCheckpoint()ed so lineage (and the replayed shuffle DAG)
    stays O(1) instead of O(iterations). Converges in diameter(G) rounds;
    near-dup clusters are shallow (dup groups are cliques-ish), so 3-5
    rounds in practice. At 100 TB the same loop holds — the per-round
    shuffle is |E|, never the transitive closure, and the early-exit
    count() touches only the label frame. (The production-hardened
    variant of this loop is the large-star/small-star algorithm of
    Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — same primitive rounds, provably fewer of them on
    high-diameter graphs.)
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .localCheckpoint()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iterations):
        propagated = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("label"))
        )
        new_labels = (
            labels.union(propagated)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "node")
            .filter(F.col("o.label") != F.col("n.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def connected_components_sql(pairs_sql: str) -> str:
    """Transitive-closure oracle for :func:`connected_components`:
    (node, component) per node of the pair graph. Recursive-CTE closure is
    O(sum of component sizes squared) — fine for an oracle at test scale,
    exactly what the iterative Spark loop avoids at corpus scale."""
    return f"""
WITH RECURSIVE __cc_pairs AS ({pairs_sql}),
__cc_edges AS (
  SELECT id_a AS src, id_b AS dst FROM __cc_pairs
  UNION ALL
  SELECT id_b, id_a FROM __cc_pairs
),
__cc_reach(node, label) AS (
  SELECT src, src FROM __cc_edges
  UNION
  SELECT e.src, r.label FROM __cc_edges e JOIN __cc_reach r ON r.node = e.dst
)
SELECT node, min(label) AS component FROM __cc_reach GROUP BY node
"""


def rolling_window_pairs_sql(table: str, id_col: str, text_col: str) -> str:
    wins = (
        "list_distinct("
        + TXT.window_hashes(text_col, ROLLING_WINDOW, "duckdb", toks_col="__toks")
        + ")"
    )
    return f"""
WITH b AS (SELECT {id_col}, {TXT.tokens(text_col, 'duckdb')} AS __toks FROM {table}),
p AS (SELECT {id_col}, unnest({wins}) AS __wh FROM b)
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, count(*) AS shared_windows
FROM p a JOIN p b ON a.__wh = b.__wh AND a.{id_col} < b.{id_col}
GROUP BY 1, 2
HAVING count(*) >= {ROLLING_MIN_SHARED}
"""


# ---------------------------------------------------------------------------
# oracle SQL builders (DuckDB dialect) — the same pipelines, verbatim math
# ---------------------------------------------------------------------------

def minhash_signatures_sql(table: str, id_col: str, text_col: str) -> str:
    toks = (
        f"list_distinct({TXT.word_bigrams(TXT.tokens(text_col, 'duckdb'), 'duckdb')})"
    )
    h = TXT.md5_int32("tok", "duckdb")
    mins = ",\n    ".join(
        f"min({TXT.universal_hash(i, '__h', MINHASH_COEFFS)}) AS mh{i}"
        for i in range(MINHASH_K)
    )
    return f"""
SELECT {id_col}, {mins}
FROM (
  SELECT {id_col}, {h} AS __h
  FROM (SELECT {id_col}, unnest({toks}) AS tok FROM {table})
)
GROUP BY {id_col}
"""


def minhash_candidate_pairs_sql(table: str, id_col: str, text_col: str) -> str:
    sig = minhash_signatures_sql(table, id_col, text_col)
    est = (
        "("
        + " + ".join(
            f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END"
            for i in range(MINHASH_K)
        )
        + f") / {float(MINHASH_K)}"
    )
    band_selects = []
    for band in range(MINHASH_BANDS):
        cols = [f"mh{band * MINHASH_ROWS + r}" for r in range(MINHASH_ROWS)]
        cond = " AND ".join(f"a.{c} = b.{c}" for c in cols)
        band_selects.append(
            f"SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, {est} AS est_sim\n"
            f"FROM sig a JOIN sig b ON {cond} AND a.{id_col} < b.{id_col}\n"
            f"WHERE {est} >= {MINHASH_MIN_EST_SIM}"
        )
    union = "\nUNION\n".join(band_selects)
    return f"WITH sig AS ({sig})\n{union}"


def simhash_sql(table: str, id_col: str, text_col: str) -> str:
    toks = TXT.distinct_tokens(text_col, "duckdb")
    h = TXT.md5_int32("tok", "duckdb")
    votes = ",\n    ".join(
        f"sum(CASE WHEN (__h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    value = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS)
    )
    return f"""
SELECT {id_col}, ({value})::BIGINT AS simhash
FROM (
  SELECT {id_col}, {votes}
  FROM (
    SELECT {id_col}, {h} AS __h
    FROM (SELECT {id_col}, unnest({toks}) AS tok FROM {table})
  )
  GROUP BY {id_col}
)
"""
