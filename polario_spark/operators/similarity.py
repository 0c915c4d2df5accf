"""Similarity search over embedding columns (array<float>).

Two strategies:

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against the corpus, one scan, per-query window top-k. The baseline
  and the oracle-checkable path. At 100 TB the corpus side stays
  partitioned; the broadcast is queries only, so cost is
  O(|corpus| * |queries|) FLOPs with zero shuffle of the corpus.

- ``ngram_jaccard_pairs`` — exact blocked pairwise Jaccard over token
  bigram sets: block on cheap keys (lang, length bucket) so the quadratic
  pair space collapses to within-block pairs; each block's pairs are an
  equi-join on the block key. The exact complement to MinHash's
  approximate candidates.

All math is built-in higher-order functions — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polario_spark.functions import text as TXT
from polario_spark.functions import vector as VEC


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
    """Exact Jaccard over word-bigram sets for within-block pairs.

    Returns (id_a, id_b, jaccard) for pairs >= threshold. The block join is
    a plain equi-join on block keys — shuffle is proportional to block
    sizes, never the full cross product.
    """
    grams = F.expr(
        f"array_distinct({TXT.word_bigrams(TXT.tokens(text_col, 'spark'), 'spark')})"
    )
    base = docs.select(
        F.col(id_col), *[F.col(c) for c in block_cols], grams.alias("__grams")
    ).withColumn("__n", F.expr("size(__grams)"))
    # Inverted-index set-similarity join: explode grams and equi-join on
    # (block, gram) so only (id, gram) ints travel through the shuffle —
    # never the full arrays. |A ∩ B| falls out of the co-occurrence count,
    # |A ∪ B| = |A| + |B| - |A ∩ B|. Pairs sharing zero grams have
    # jaccard 0 < threshold, so skipping them is exact, not approximate.
    postings = base.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.col("__n"),
        F.explode("__grams").alias("__g"),
    )
    a, b = postings.alias("a"), postings.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols] + [
        F.col("a.__g") == F.col("b.__g"),
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
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
