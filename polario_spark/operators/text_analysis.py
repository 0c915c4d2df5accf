"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

Pure built-in expression pipelines (generated through
polario_spark.functions.text so the DuckDB oracle runs the identical
math). Per-row scalar work -> embarrassingly parallel; the aggregations
are map-side combinable groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polario_spark.functions import text as TXT


def _metrics_exprs(text_col: str, dialect: str) -> dict[str, str]:
    toks = TXT.tokens(text_col, dialect)
    n_tokens = TXT.array_size(toks, dialect)
    n_distinct = TXT.array_size(TXT.distinct_tokens(text_col, dialect), dialect)
    n_stop = TXT.count_matching(toks, TXT.STOPWORDS, dialect)
    return {
        "n_tokens": n_tokens,
        "n_distinct": n_distinct,
        # lexical diversity + stopword density at double precision
        "distinct_ratio": f"round({n_distinct}::DOUBLE / {n_tokens}, 4)"
        if dialect == "duckdb"
        else f"round(cast({n_distinct} as double) / {n_tokens}, 4)",
        "stopword_ratio": f"round({n_stop}::DOUBLE / {n_tokens}, 4)"
        if dialect == "duckdb"
        else f"round(cast({n_stop} as double) / {n_tokens}, 4)",
        "avg_token_len": (
            f"round((length(replace(array_to_string({toks}, ' '), ' ', ''))"
            f")::DOUBLE / {n_tokens}, 4)"
            if dialect == "duckdb"
            else f"round(cast(length(replace({TXT.array_join(toks, ' ', 'spark')}, ' ', '')) as double) / {n_tokens}, 4)"
        ),
    }


def doc_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics as new columns."""
    exprs = _metrics_exprs(text_col, "spark")
    out = docs
    for name, expr in exprs.items():
        out = out.withColumn(name, F.expr(expr))
    return out


def doc_metrics_sql_exprs(text_col: str = "text") -> dict[str, str]:
    return _metrics_exprs(text_col, "duckdb")


def lang_scores_exprs(text_col: str, dialect: str) -> dict[str, str]:
    toks = TXT.tokens(text_col, dialect)
    return {
        lang: TXT.count_matching(toks, words, dialect)
        for lang, words in TXT.LANG_MARKERS.items()
    }


def predicted_lang_expr(text_col: str, dialect: str) -> str:
    """Deterministic argmax over marker-word scores; 'und' (undetermined)
    when no marker occurs. Ties resolve in fixed language order."""
    scores = lang_scores_exprs(text_col, dialect)
    langs = list(scores)
    gt = ", ".join(scores.values())
    cases = " ".join(
        f"WHEN {scores[lang]} = greatest({gt}) THEN '{lang}'" for lang in langs
    )
    any_marker = " + ".join(scores.values())
    return f"(CASE WHEN ({any_marker}) = 0 THEN 'und' {cases} END)"


def filter_flag_exprs(text_col: str, dialect: str) -> dict[str, str]:
    """Corpus-cleaning filter flags (Gopher-rule style, Rae et al. '21,
    adapted to single-line fixture docs), each a 0/1 integer expression.

    All thresholds are compared in integer arithmetic (ratio r >= t
    rewritten as n*den >= t_num*num) so Spark and the SQL oracle can never
    disagree on a float boundary:

    - ``pass_len``: 10 <= n_tokens <= 1000;
    - ``pass_diversity``: distinct/total token ratio >= 0.3;
    - ``pass_top_freq``: most frequent token <= 20% of tokens (the
      single-token analog of Gopher's duplicate-line fraction);
    - ``pass_word_len``: mean token length in [3, 10] chars.
    """
    toks = TXT.tokens(text_col, dialect)
    dtoks = TXT.distinct_tokens(text_col, dialect)
    n_tokens = TXT.array_size(toks, dialect)
    n_distinct = TXT.array_size(dtoks, dialect)
    if dialect == "spark":
        top_freq = (
            f"array_max(transform({dtoks}, "
            f"t -> size(filter({toks}, x -> x = t))))"
        )
        n_chars = f"length(replace({TXT.array_join(toks, ' ', 'spark')}, ' ', ''))"
    else:
        top_freq = (
            f"list_max(list_transform({dtoks}, "
            f"t -> len(list_filter({toks}, x -> x = t))))"
        )
        n_chars = f"length(replace(array_to_string({toks}, ' '), ' ', ''))"
    as_int = (lambda e: f"({e})::INT") if dialect == "duckdb" else (
        lambda e: f"cast(({e}) as int)"
    )
    return {
        "pass_len": as_int(f"{n_tokens} BETWEEN 10 AND 1000"),
        "pass_diversity": as_int(f"{n_distinct} * 10 >= {n_tokens} * 3"),
        "pass_top_freq": as_int(f"({top_freq}) * 5 <= {n_tokens}"),
        "pass_word_len": as_int(
            f"{n_chars} >= 3 * {n_tokens} AND {n_chars} <= 10 * {n_tokens}"
        ),
    }


def repetition_exprs(text_col: str, dialect: str) -> dict[str, str]:
    """Intra-document repetition signals (Gopher repetition rules, Rae et
    al. '21 §A1.1: duplicate line / n-gram fractions), one pure expression
    per signal so the whole set rides the scan's codegen stage — no
    explode, no shuffle, embarrassingly parallel at any corpus size.

    Fractions are count-weighted duplicate shares: 1 - distinct/total,
    0 for empty denominators. Ratios round at 4 after double division;
    numerators/denominators are exact integers in both dialects, so the
    only float op is the final divide — cross-engine stable.
    """
    toks = TXT.tokens(text_col, dialect)
    lns = TXT.lines(text_col, dialect)
    distinct = "array_distinct" if dialect == "spark" else "list_distinct"
    size = lambda e: TXT.array_size(e, dialect)  # noqa: E731

    def dup_frac(arr: str) -> str:
        total, uniq = size(arr), size(f"{distinct}({arr})")
        ratio = (
            f"({total} - {uniq})::DOUBLE / {total}"
            if dialect == "duckdb"
            else f"cast({total} - {uniq} as double) / {total}"
        )
        return f"round(case when {total} = 0 then 0.0 else {ratio} end, 4)"

    return {
        "n_lines": size(lns),
        "dup_line_frac": dup_frac(lns),
        "dup_token_frac": dup_frac(toks),
        "dup_bigram_frac": dup_frac(TXT.word_ngrams(toks, 2, dialect)),
        "dup_trigram_frac": dup_frac(TXT.word_ngrams(toks, 3, dialect)),
    }


def fingerprint_expr(text_col: str, dialect: str) -> str:
    """Content fingerprint: md5 of the sorted distinct token set (word-order
    independent document identity)."""
    joined = TXT.array_join(TXT.sorted_distinct_tokens(text_col, dialect), " ", dialect)
    return f"md5({joined})"


#: training-chunk geometry: CHUNK_TOKENS tokens per chunk, starts every
#: CHUNK_STRIDE tokens (CHUNK_TOKENS - CHUNK_STRIDE tokens of overlap so no
#: boundary context is lost). Requires CHUNK_STRIDE <= CHUNK_TOKENS.
CHUNK_TOKENS = 50
CHUNK_STRIDE = 40


def chunk_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Split documents into overlapping fixed-token training chunks:
    (doc_id, chunk_id, n_chunk_tokens, chunk_hash) — the pre-tokenization
    chunking step that feeds sequence packing.

    Chunk count per doc is pure integer math (1 + ceil(max(n - C, 0)/S),
    0 for empty docs) so Spark and the oracle can never disagree on
    geometry; chunk content is carried as an md5 hash, not the text, to
    keep the result narrow. Scale shape: one generate-and-posexplode over
    the scan — per-row work linear in document length, no shuffle, no
    Python; the output inherits the input partitioning."""
    toks = TXT.tokens(text_col, "spark")
    n = f"size({toks})"
    n_chunks = (
        f"case when {n} = 0 then 0 else "
        f"1 + cast(floor((greatest({n} - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE} - 1) "
        f"/ {CHUNK_STRIDE}) as int) end"
    )
    chunk = f"array_join(slice({toks}, 1 + k * {CHUNK_STRIDE}, {CHUNK_TOKENS}), ' ')"
    gen = (
        f"case when {n_chunks} = 0 then cast(array() as array<struct<chunk_id:int,"
        f"n_chunk_tokens:int,chunk_hash:string>>) else "
        f"transform(sequence(0, {n_chunks} - 1), k -> named_struct("
        f"'chunk_id', k, "
        f"'n_chunk_tokens', size(slice({toks}, 1 + k * {CHUNK_STRIDE}, {CHUNK_TOKENS})), "
        f"'chunk_hash', md5({chunk}))) end"
    )
    return docs.select(
        "doc_id", F.explode(F.expr(gen)).alias("__c")
    ).select(
        "doc_id",
        F.col("__c.chunk_id").alias("chunk_id"),
        F.col("__c.n_chunk_tokens").alias("n_chunk_tokens"),
        F.col("__c.chunk_hash").alias("chunk_hash"),
    )


def chunk_documents_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB twin of chunk_documents — identical integer geometry."""
    toks = TXT.tokens(text_col, "duckdb")
    n = f"len({toks})"
    n_chunks = (
        f"case when {n} = 0 then 0 else "
        f"1 + ((greatest({n} - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE} - 1) "
        f"// {CHUNK_STRIDE}) end"
    )
    chunk = (
        f"array_to_string(({toks})[1 + k * {CHUNK_STRIDE}:"
        f"{CHUNK_TOKENS} + k * {CHUNK_STRIDE}], ' ')"
    )
    return f"""
SELECT doc_id,
       k AS chunk_id,
       len(({toks})[1 + k * {CHUNK_STRIDE}:{CHUNK_TOKENS} + k * {CHUNK_STRIDE}]) AS n_chunk_tokens,
       md5({chunk}) AS chunk_hash
FROM {table}, unnest(range(0, {n_chunks})) AS u(k)
"""
