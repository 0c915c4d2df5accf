"""Similarity search over embedding columns (array<float>).

Two strategies:

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against the corpus, one scan, per-query window top-k. The baseline
  and the oracle-checkable path. At 100 TB the corpus side stays
  partitioned; the broadcast is queries only, so cost is
  O(|corpus| * |queries|) FLOPs with zero shuffle of the corpus.

- ``ngram_jaccard_pairs`` — exact pairwise Jaccard over token bigram
  sets via an inverted-index co-occurrence join blocked on cheap keys
  (lang); intersection sizes fall out of a count per pair, so no pair
  ever materializes both gram arrays. The exact complement to MinHash's
  approximate candidates.

All math is built-in higher-order functions — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polario_spark.functions import text as TXT
from polario_spark.functions import vector as VEC
from polario_spark.plans.parallelism import ensure_parallelism


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (qid, nid, sim) with sim rounded to 4 decimals; deterministic
    tie-break on neighbor id.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"), F.col(vec_col).alias("__qvec")
        )
    )
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("__cvec"))
    sim = F.round(F.expr(VEC.cosine("__qvec", "__cvec", "spark")), 4).alias("sim")
    pairs = q.join(c, F.col("qid") != F.col("nid")).select("qid", "nid", sim)
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "sim", "rank")
    )


def brute_force_topk_sql(
    table: str, query_pred: str, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 5,
) -> str:
    sim = VEC.cosine("q.__qvec", "c.__cvec", "duckdb")
    return f"""
WITH q AS (SELECT {id_col} AS qid, {vec_col} AS __qvec FROM {table} WHERE {query_pred}),
     c AS (SELECT {id_col} AS nid, {vec_col} AS __cvec FROM {table})
SELECT qid, nid, sim, rank FROM (
  SELECT qid, nid, round({sim}, 4) AS sim,
         row_number() OVER (PARTITION BY qid ORDER BY round({sim}, 4) DESC, nid ASC) AS rank
  FROM q JOIN c ON qid != nid
) WHERE rank <= {k}
"""


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    threshold: float = 0.6,
) -> DataFrame:
    """Exact Jaccard over word-bigram sets for within-block pairs, as an
    inverted-index set-similarity join.

    Returns (id_a, id_b, jaccard) for pairs >= threshold.

    Plan shape: inverted-index co-occurrence join. Explode each doc's
    distinct grams into postings, self-equi-join on (block, gram-key) so
    |A ∩ B| falls out of a count per pair — no per-pair array
    re-materialization or array_intersect, the whole pipeline is int
    columns through whole-stage codegen. |A ∪ B| = |A| + |B| - |A ∩ B|.
    Pairs sharing zero grams have jaccard 0 < threshold, so never
    producing them is exact pruning, not approximation.

    Two further prunings, both exact:
    - gram keys are xxhash64(gram) — 8-byte join keys instead of strings
      (collision odds ~ vocab^2 / 2^64, vanishing for any real corpus);
    - length-ratio filter inside the join condition: J >= t forces
      min(|A|,|B|) >= t * max(|A|,|B|) (+1e-9 guards binary-float t*n,
      e.g. 0.6*5 -> 3.0000000000000004, from over-pruning).

    Scale: shuffle volume is postings (linear in corpus), join output is
    sum over (block, gram) of df^2 — the skew lever is the block key, so
    callers should block on (lang, length-bucket, shard) for open-domain
    corpora; for very large vocabularies a rarity-prefix filter
    (Bayardo et al., WWW'07) in front of this join cuts df^2 further.
    AQE's skew-join handles residual hot grams.
    """
    docs = ensure_parallelism(docs)
    grams = F.expr(
        f"array_distinct({TXT.word_bigrams(TXT.tokens(text_col, 'spark'), 'spark')})"
    )
    base = (
        docs.select(
            F.col(id_col), *[F.col(c) for c in block_cols], grams.alias("__grams")
        )
        .withColumn("__n", F.expr("size(__grams)"))
        .filter(F.col("__n") > 0)
    )
    postings = base.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.col("__n"),
        F.explode(F.expr("transform(__grams, g -> xxhash64(g))")).alias("__g"),
    )
    a, b = postings.alias("a"), postings.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols] + [
        F.col("a.__g") == F.col("b.__g"),
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
        F.least(F.col("a.__n"), F.col("b.__n")) + F.lit(1e-9)
        >= F.lit(threshold) * F.greatest(F.col("a.__n"), F.col("b.__n")),
    ]
    co = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__n").alias("__na"),
            F.col("b.__n").alias("__nb"),
        )
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    jac = F.round(
        F.col("__inter").cast("double")
        / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double"),
        4,
    ).alias("jaccard")
    return co.select("id_a", "id_b", jac).filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    threshold: float = 0.6,
) -> str:
    grams = f"list_distinct({TXT.word_bigrams(TXT.tokens(text_col, 'duckdb'), 'duckdb')})"
    blocks = ", ".join(block_cols)
    cond = " AND ".join(f"a.{c} = b.{c}" for c in block_cols)
    return f"""
WITH g AS (SELECT {id_col}, {blocks}, {grams} AS __grams FROM {table})
SELECT id_a, id_b, jaccard FROM (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
         round(len(list_intersect(a.__grams, b.__grams))::DOUBLE
               / len(list_distinct(list_concat(a.__grams, b.__grams)))::DOUBLE, 4) AS jaccard
  FROM g a JOIN g b ON {cond} AND a.{id_col} < b.{id_col}
) WHERE jaccard >= {threshold}
"""
