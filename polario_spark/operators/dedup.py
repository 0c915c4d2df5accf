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
identical boilerplate docs pile into one bucket, and a naive self-join
emits O(m^2) candidate pairs for an m-doc bucket (a crawl's boilerplate
cluster is millions of docs; AQE skew-join only spreads that quadratic
work, it cannot shrink the pair cardinality). Both pair generators
therefore cap the bucket size: buckets over ``DEDUP_BUCKET_CAP`` emit
**star pairs to the bucket's min id** (m-1 pairs) instead of all pairs.
For the dedup use-case this is what matters — every bucket member still
reaches the same connected component through the hub, and an over-cap
bucket is a degenerate "everything matches here" group whose pairwise
similarity values are uninformative anyway. The cap is checked per
bucket with a window count on the same key the join shuffles on, so it
adds no new exchange key.
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

#: Largest band/window bucket whose pairs are fully enumerated. Buckets
#: over the cap collapse to star pairs (hub = bucket min id). Real
#: near-dup groups are far below this (sf0.1 measures: max band bucket
#: 17, max window bucket 4); only boilerplate clusters trip it. Raising
#: the cap trades pair recall detail for O(cap * m) worst-case output.
DEDUP_BUCKET_CAP = 512


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep exactly one row per key: the one with the smallest id.

    Deterministic alternative to ``df.dropDuplicates(key_cols)``. Executes
    as a single hash-aggregate / window over the key shuffle. NULL ids
    rank LAST (Spark's default asc is NULLS FIRST, which would crown a
    NULL-id row the survivor over every real id — and diverge from the
    SQL engines' NULLS-LAST ``ORDER BY id`` formulation of the same rule).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(id_col).asc_nulls_last())
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


def minhash_candidate_pairs(
    sig: DataFrame, id_col: str, bucket_cap: int = DEDUP_BUCKET_CAP
) -> DataFrame:
    """LSH banding as ONE join: explode each signature into its band rows
    (band_idx, band values), self-equi-join on the band, distinct the
    pairs, then join the signature table back twice for the agreement
    estimate.

    Returns (id_a, id_b, est_sim): est_sim = fraction of the k minhashes
    that agree — an unbiased estimate of Jaccard similarity.

    Scale: the naive formulation (union of per-band self-joins) recomputes
    the signature pipeline 2 x bands times; this shape computes it once
    for the band explode. Band buckets are the skew hazard: m
    boilerplate-identical docs share one bucket and all-pairs enumeration
    is O(m^2). Buckets over ``bucket_cap`` therefore emit star pairs to
    the bucket's min id (m-1 pairs) — connected components through the
    candidate graph are unchanged (every member still reaches the hub;
    hypothesis-pinned), and over-cap buckets are degenerate
    near-identical groups where the individual pair list carries no
    extra information. The bucket census is an aggregate on the SAME
    band key the join shuffles on (one exchange, reused).

    The estimate is computed INSIDE the candidate join's projection —
    each band row carries its doc's full k-value signature (k ints,
    linear in corpus) — and the ``est_sim >= MINHASH_MIN_EST_SIM``
    filter runs before anything else touches the pair stream. Round 11's
    x300 probe measured why this matters: bucket families grow linearly
    with the corpus while staying under the cap, so the CANDIDATE pair
    space is quadratic (21.4M at x100 -> 192.7M at x300) while true
    pairs stay linear (69k) — the earlier shape shipped that quadratic
    stream through a distinct() exchange plus TWO signature join-backs
    before filtering 99.96% of it away. Scoring in the join keeps the
    quadratic part streaming through whole-stage codegen inside the
    join task (12 int compares per candidate, never materialized); only
    surviving pairs — linear — reach a shuffle. distinct() then dedups
    multi-band collisions AFTER the filter, which is equivalent because
    est_sim is a pure function of the two signatures (every band's copy
    of a pair scores identically).
    """
    # Round 16 (opt): the k-value signature rides the join as ONE array
    # column instead of k scalar columns. Values and results are
    # identical (the estimate is still "matching positions / k"; NULL
    # components compare unequal on both paths), but the plan shrinks
    # from k-wide projections and a k-term CASE chain per join side to
    # three columns and one zip_with — Catalyst physical planning of the
    # self-join (constraint propagation over the column set) was ~1.0 s
    # of the entry's ~2.0 s at sf0.1, and the phase split showed it, not
    # execution, as the dominant term. Interleaved A/B: wins 4/4 pairs,
    # mean 2.41 -> 2.06 s, row-identical.
    sig = sig.select(
        F.col(id_col),
        F.array(*[F.col(f"mh{i}") for i in range(MINHASH_K)]).alias("__sig"),
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("bidx"),
                *[
                    F.col("__sig")[band * MINHASH_ROWS + r].alias(f"v{r}")
                    for r in range(MINHASH_ROWS)
                ],
            )
            for band in range(MINHASH_BANDS)
        ]
    )
    # the signature pipeline (token explode + k min-aggregates) feeds
    # multiple plan branches (a/b band rows + the star hub lookup); a lazy
    # localCheckpoint materializes it once — one row per doc, far cheaper
    # to store than to recompute, and release_cached_residue sweeps the
    # blocks between bench runs
    sig = sig.localCheckpoint(eager=False)
    bands = sig.select(
        F.col(id_col), F.explode(band_structs).alias("__b"), "__sig"
    )
    # bucket census as an AGGREGATE, not a window (map-side combine: the
    # shuffle carries one partial per (task, bucket)), then keep ONLY the
    # over-cap buckets — that frame is <= |band rows|/cap by construction
    # and EMPTY on organic corpora, so the anti-join below is a broadcast
    # of (almost always) nothing and the band rows shuffle exactly once,
    # for the self-join — the capped plan costs what the uncapped one did
    hot = (
        bands.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__bn"), F.min(id_col).alias("__bmin"))
        .filter(F.col("__bn") > bucket_cap)
    )
    small = bands.join(hot.select("__b"), "__b", "left_anti")
    a, b = small.alias("a"), small.alias("b")

    def est(left: str, right: str):
        # matching positions / k over the array signatures: a NULL
        # component yields NULL from the equality and the filter drops
        # it — exactly the 0 the scalar CASE chain contributed
        return (
            F.expr(
                f"size(filter(zip_with({left}.__sig, {right}.__sig,"
                " (x, y) -> x = y), z -> z))"
            )
            / F.lit(float(MINHASH_K))
        ).alias("est_sim")

    all_pairs = (
        a.join(
            b,
            (F.col("a.__b") == F.col("b.__b"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            est("a", "b"),
        )
        .filter(F.col("est_sim") >= MINHASH_MIN_EST_SIM)
    )
    # star pairs score member-vs-hub: the hub's signature arrives on the
    # hot frame (almost always tiny, <= |band rows|/cap) — but that bound
    # SCALES with the corpus, so the broadcast decision is left to AQE's
    # runtime sizing rather than forced (a boilerplate-heavy 1e9-doc
    # corpus can push hub_sig to millions of rows; a pinned broadcast
    # there is a driver OOM, exactly the shape round 11 unforced in the
    # batch queries)
    hub_sig = hot.join(
        sig.select(
            F.col(id_col).alias("__bmin"), F.col("__sig").alias("__hub_sig")
        ),
        "__bmin",
    ).select("__b", "__bmin", "__hub_sig")
    est_hub = (
        F.expr(
            "size(filter(zip_with(__hub_sig, m.__sig, (x, y) -> x = y),"
            " z -> z))"
        )
        / F.lit(float(MINHASH_K))
    ).alias("est_sim")
    star_pairs = (
        bands.alias("m")
        .join(hub_sig, "__b")
        .filter(F.col(id_col) != F.col("__bmin"))
        .select(
            F.col("__bmin").alias("id_a"),
            F.col(id_col).alias("id_b"),
            est_hub,
        )
        .filter(F.col("est_sim") >= MINHASH_MIN_EST_SIM)
    )
    return all_pairs.unionAll(star_pairs).distinct()


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
    df: DataFrame,
    id_col: str,
    text_col: str,
    bucket_cap: int = DEDUP_BUCKET_CAP,
) -> DataFrame:
    """Chunk-level near-dup pairs via rolling-window fingerprints.

    Each doc is reduced to its stream of w-token window hashes
    (Rabin-Karp/winnowing chunking); documents sharing >=
    ``ROLLING_MIN_SHARED`` distinct window hashes are emitted with the
    shared count. Order-sensitive — catches copied passages that token-set
    fingerprints miss. Same co-occurrence-join shape as the Jaccard
    operator: shuffle is postings, never the pair space; 8-token windows
    are near-unique on organic text, so posting lists stay short — EXCEPT
    for boilerplate (m copies of one passage put m docs in each of its
    window buckets, and all-pairs is O(m^2) per bucket). Window buckets
    over ``bucket_cap`` therefore contribute star rows to the bucket's
    min id instead of all pairs: each over-cap hash adds 1 to
    (bucket_min, member)'s shared count. A boilerplate cluster still
    exceeds ``ROLLING_MIN_SHARED`` through its hub (it shares ALL its
    windows), so its members land in one connected component exactly as
    before, with O(m) pairs instead of O(m^2). The only semantics change
    is for pairs whose ONLY shared windows are over-cap buckets with
    scattered hubs — a regime where the pair list is boilerplate noise,
    not passage copying.
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
    # the tokenize + rolling-hash explode feeds four branches (census,
    # a/b sides, star rows); materialize it once instead of recomputing
    # the md5 window hashing per branch
    postings = bound.select(
        F.col(id_col), F.explode(wins).alias("__wh")
    ).localCheckpoint(eager=False)
    # over-cap census only (<= |postings|/cap rows, empty on organic
    # text): broadcast anti-join leaves the normal-regime plan unchanged
    # — see minhash_candidate_pairs
    hot = (
        postings.groupBy("__wh")
        .agg(F.count(F.lit(1)).alias("__bn"), F.min(id_col).alias("__bmin"))
        .filter(F.col("__bn") > bucket_cap)
    )
    small = postings.join(hot.select("__wh"), "__wh", "left_anti")
    a, b = small.alias("a"), small.alias("b")
    all_rows = a.join(
        b,
        (F.col("a.__wh") == F.col("b.__wh"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    )
    star_rows = (
        postings.join(hot, "__wh")
        .filter(F.col(id_col) != F.col("__bmin"))
        .select(F.col("__bmin").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    return (
        all_rows.unionAll(star_rows)
        .groupBy("id_a", "id_b")
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

    Each iteration is one |E| join + one label-frame self-join (pointer
    jumping: node's label shrinks to its label's label, so label chains
    halve every round) + one map-side-combinable min-agg; labels are
    localCheckpoint()ed so lineage (and the replayed shuffle DAG) stays
    O(1) instead of O(iterations). Edge propagation alone needs
    diameter(G) rounds — a chain of m successively-shifted near-dup docs
    (A~B~C~...) has diameter m and would silently exhaust any fixed
    iteration budget; with the jump step the combined loop converges in
    O(log diameter) rounds (hash-to-min style, cf. Rastogi et al.,
    "Finding Connected Components in Map-Reduce in Logarithmic Rounds",
    ICDE'13; Kiveris et al., SoCC'14), so ``max_iterations=25`` covers
    any graph a real corpus can produce (2^25-hop chains). Safety over
    silence: if the budget is somehow exhausted before convergence the
    loop RAISES rather than returning not-yet-propagated labels — an
    unconverged label frame is a wrong answer, not a degraded one. At
    100 TB the same loop holds — the per-round shuffle is |E| + |V|,
    never the transitive closure, and the early-exit count() touches
    only the label frame.

    Pointer-jump safety: label(u) is always the id of a node reachable
    from u (it starts as u and only ever moves to a label some reachable
    node holds), so label(label(u)) is reachable too — the jump can
    never escape u's component, it only shortcuts within it.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .localCheckpoint()
    )
    labels: "DataFrame | None" = None
    node_type = edges.schema["src"].dataType
    null_old = F.lit(None).cast(node_type)
    converged = False
    for i in range(max_iterations):
        # Round 15 (opt): each old-label row carries itself in ``__old``
        # (propagated/jumped rows carry NULL, which min() ignores), so
        # the aggregate below lands BOTH min(label) and the node's prior
        # label in one pass, and convergence becomes a filter-count on
        # the checkpointed result — the separate old-vs-new join (a
        # second shuffle per round) is gone. With the checkpoint LAZY,
        # that count is also what materializes the round's blocks: ONE
        # job per round instead of checkpoint-materialize + join + count.
        # Labels are monotone non-increasing (the old label is always in
        # the union), so label < __old captures exactly "changed".
        if i == 0:
            # Round 16 (opt): round 0's labels are the identity map, so
            # the |E| x |V| propagation join is just a projection of the
            # edge set (label(src) = src), and the |V| distinct that
            # built the identity frame is unnecessary too — identity
            # rows may carry per-edge multiplicity because the min-agg
            # collapses duplicates (min over equal values) and __old is
            # the same u on every copy. Two shuffles removed from the
            # first round at any scale.
            combined = edges.select(
                F.col("src").alias("node"),
                F.col("src").alias("label"),
                F.col("src").alias("__old"),
            ).union(
                edges.select(
                    F.col("dst").alias("node"),
                    F.col("src").alias("label"),
                    null_old.alias("__old"),
                )
            )
        else:
            propagated = (
                edges.join(labels, edges.src == labels.node)
                .select(F.col("dst").alias("node"), F.col("label"))
            )
            combined = labels.select(
                "node", "label", F.col("label").alias("__old")
            ).union(propagated.withColumn("__old", null_old))
        # pointer jumping: every label is itself a node of the graph, so
        # its current label is one lookup away; min(label, label-of-label)
        # halves chain depth per round, turning diameter-bound convergence
        # into log-diameter. Skipped in round 0, where labels are still
        # the identity map and the jump is provably a no-op.
        if i > 0:
            jumped = (
                labels.alias("l1")
                .join(labels.alias("l2"), F.col("l1.label") == F.col("l2.node"))
                .select(
                    F.col("l1.node").alias("node"),
                    F.col("l2.label").alias("label"),
                    null_old.alias("__old"),
                )
            )
            combined = combined.union(jumped)
        new_labels = (
            combined
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.min("__old").alias("__old"))
            .localCheckpoint(eager=False)
        )
        # INVARIANT (r15 ADVICE): a NULL __old (node absent from the
        # previous label frame) counts as UNCHANGED here, which is only
        # sound because no such node exists — every propagated/jumped
        # dst is also a src of the symmetric edge union, and labels
        # seeds from exactly those nodes, so every aggregated node
        # carries its own prior label in __old. A future edge
        # construction that breaks the symmetric-union property could
        # otherwise exit convergence early with newly-appeared,
        # never-counted nodes.
        changed = new_labels.filter(F.col("label") < F.col("__old")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds — with pointer jumping that needs a component of "
            f"diameter > 2^{max_iterations}; raise max_iterations"
        )
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


def rolling_window_pairs_sql(
    table: str, id_col: str, text_col: str, bucket_cap: int = DEDUP_BUCKET_CAP
) -> str:
    """Oracle twin of :func:`rolling_window_pairs`, including the over-cap
    star-row contribution — both engines must agree on capped buckets."""
    wins = (
        "list_distinct("
        + TXT.window_hashes(text_col, ROLLING_WINDOW, "duckdb", toks_col="__toks")
        + ")"
    )
    return f"""
WITH b AS (SELECT {id_col}, {TXT.tokens(text_col, 'duckdb')} AS __toks FROM {table}),
p AS (SELECT {id_col}, unnest({wins}) AS __wh FROM b),
pp AS (
  SELECT {id_col}, __wh,
         count(*) OVER (PARTITION BY __wh) AS __bn,
         min({id_col}) OVER (PARTITION BY __wh) AS __bmin
  FROM p
),
contrib AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM pp a JOIN pp b ON a.__wh = b.__wh AND a.{id_col} < b.{id_col}
  WHERE a.__bn <= {bucket_cap}
  UNION ALL
  SELECT __bmin, {id_col} FROM pp
  WHERE __bn > {bucket_cap} AND {id_col} != __bmin
)
SELECT id_a, id_b, count(*) AS shared_windows
FROM contrib
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


def minhash_candidate_pairs_sql(
    table: str, id_col: str, text_col: str, bucket_cap: int = DEDUP_BUCKET_CAP
) -> str:
    """Oracle twin of :func:`minhash_candidate_pairs`: band rows -> bucket
    census -> all-pairs under the cap / star pairs over it -> distinct ->
    signature join-back for est_sim. Mirrors the Spark shape exactly so
    both engines agree on capped buckets."""
    sig = minhash_signatures_sql(table, id_col, text_col)
    est = (
        "("
        + " + ".join(
            f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
            for i in range(MINHASH_K)
        )
        + f") / {float(MINHASH_K)}"
    )
    band_rows = "\nUNION ALL\n".join(
        "SELECT {id}, {band} AS bidx, {vals} FROM sig".format(
            id=id_col,
            band=band,
            vals=", ".join(
                f"mh{band * MINHASH_ROWS + r} AS v{r}"
                for r in range(MINHASH_ROWS)
            ),
        )
        for band in range(MINHASH_BANDS)
    )
    vcols = [f"v{r}" for r in range(MINHASH_ROWS)]
    bkey = ", ".join(["bidx"] + vcols)
    jcond = " AND ".join(f"a.{c} = b.{c}" for c in ["bidx"] + vcols)
    return f"""
WITH sig AS ({sig}),
bands AS ({band_rows}),
bb AS (
  SELECT *, count(*) OVER (PARTITION BY {bkey}) AS __bn,
         min({id_col}) OVER (PARTITION BY {bkey}) AS __bmin
  FROM bands
),
cand AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b
    FROM bb a JOIN bb b ON {jcond} AND a.{id_col} < b.{id_col}
    WHERE a.__bn <= {bucket_cap}
    UNION ALL
    SELECT __bmin, {id_col} FROM bb
    WHERE __bn > {bucket_cap} AND {id_col} != __bmin
  )
)
SELECT id_a, id_b, {est} AS est_sim
FROM cand
JOIN sig sa ON sa.{id_col} = cand.id_a
JOIN sig sb ON sb.{id_col} = cand.id_b
WHERE {est} >= {MINHASH_MIN_EST_SIM}
"""


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
