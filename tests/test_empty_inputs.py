"""Empty-input robustness sweep.

At scale, pipeline stages routinely receive empty inputs — a pruned-out
partition, a day with no events, a corpus slice where every document was
filtered upstream. Every registry operator must degrade to an empty (or
small constant) result, never throw. This sweep materializes a
schema-identical, zero-row copy of every fixture table and runs the
whole batch registry over it.
"""

from __future__ import annotations

import pytest

from polario_spark import queries as Q
from polario_spark.sources.tables import TABLES

# Entries whose CONTRACT is about non-empty data: they assert internal
# invariants (fragment counts dropping, writes happening) that are
# meaningless on zero rows, or synthesize their own literal input.
SKIP = {
    # asserts fragment count strictly drops after compaction — an empty
    # write produces no fragments to compact
    "compact_roundtrip",
    # writes literal fixture data, not table-derived (already covered)
    "csv_roundtrip",
    "json_roundtrip",
    "orc_roundtrip",
    "upsert_roundtrip",
    "federated_three_formats",
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf")
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        schema = spark.read.parquet(f"{src}/{t}.parquet").schema
        spark.createDataFrame([], schema).coalesce(1).write.parquet(
            str(root / f"{t}.parquet")
        )
    return str(root)


@pytest.mark.parametrize("name", [n for n in sorted(Q.REGISTRY) if n not in SKIP])
def test_registry_entry_tolerates_empty_tables(spark, empty_sf_dir, name):
    if name == "dedup_embedding_cosine_lsh_sized":
        # an empty corpus legitimately resolves different sized dials
        # than the baked gate oracle — the r13 mismatch warning firing
        # here is CORRECT behavior, so assert it (and keep the suite
        # warning-clean)
        with pytest.warns(RuntimeWarning, match="differ from the baked"):
            rows = Q.REGISTRY[name].spark(spark, empty_sf_dir).collect()
    else:
        rows = Q.REGISTRY[name].spark(spark, empty_sf_dir).collect()
    assert isinstance(rows, list)


def test_corrupt_embedding_rows_are_excluded_not_fatal(spark, tmp_path):
    """A NULL, empty, or wrong-length embedding row — routine in real
    corpora (failed embedding jobs, truncated writes) — must be excluded
    by the similarity operators, never crash them: the GEMM paths
    np.stack a group into one matrix (one ragged row kills the job) and
    the LSH signatures index elements directly (out-of-bounds on short
    arrays). Clean-corpus results must be bit-identical with the corrupt
    rows present."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf_corrupt"
    d.mkdir()
    for t in TABLES:
        if t != "embeddings":
            os.symlink(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    bad = spark.createDataFrame(
        [(99901, None), (99902, []), (99903, [0.5, 0.25])],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    for c, dtype in emb.dtypes:
        if c not in ("vec_id", "embedding"):
            bad = bad.withColumn(c, F.lit(None).cast(dtype))
    emb.unionByName(bad.select(emb.columns)).write.parquet(
        str(d / "embeddings.parquet")
    )
    for name in [
        "dedup_embedding_cosine",
        "dedup_embedding_cosine_lsh",
        "dedup_embedding_cosine_lsh_loose",
        "semantic_dedup",
    ]:
        clean = sorted(map(tuple, Q.REGISTRY[name].spark(spark, src).collect()))
        dirty = sorted(
            map(tuple, Q.REGISTRY[name].spark(spark, str(d)).collect())
        )
        assert clean == dirty, name


def test_all_null_document_row_is_not_fatal(spark, tmp_path):
    """An all-null document row (failed extraction upstream) must not
    crash any text-pipeline entry. The Python UDTF is pinned exactly:
    a null text yields zero expanded rows — the same as the oracle's
    unnest(NULL) — so its result must be bit-identical to the clean
    corpus."""
    import os

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf_nulldoc"
    d.mkdir()
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    docs = spark.read.parquet(f"{src}/documents.parquet")
    bad = spark.createDataFrame([tuple(None for _ in docs.columns)], docs.schema)
    docs.unionByName(bad).write.parquet(str(d / "documents.parquet"))
    for name in [
        "udtf_repeated_tokens",
        "dedup_minhash",
        "exact_substring_dup",
        "decontamination_overlap_8gram",
        "tfidf_top_terms",
        "token_budget_packing",
    ]:
        rows = Q.REGISTRY[name].spark(spark, str(d)).collect()
        assert isinstance(rows, list), name
    clean = sorted(
        map(tuple, Q.REGISTRY["udtf_repeated_tokens"].spark(spark, src).collect())
    )
    dirty = sorted(
        map(tuple, Q.REGISTRY["udtf_repeated_tokens"].spark(spark, str(d)).collect())
    )
    assert clean == dirty


def test_malformed_json_props_are_not_fatal(spark, tmp_path):
    """One malformed props row in an event log must not abort the
    variant/json entries — try_parse_json nulls it and the typed
    aggregates exclude it, leaving clean-row results unchanged."""
    import os

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf_badjson"
    d.mkdir()
    for t in TABLES:
        if t != "events":
            os.symlink(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    ev = spark.read.parquet(f"{src}/events.parquet")
    row = ev.limit(1).collect()[0].asDict()
    bad_rows = []
    for i, props in enumerate(["{not json", "", "[1,2", '{"k": }']):
        r = dict(row)
        r["event_id"] = 900000 + i
        r["props"] = props
        bad_rows.append(tuple(r[c] for c in ev.columns))
    ev.unionByName(spark.createDataFrame(bad_rows, ev.schema)).write.parquet(
        str(d / "events.parquet")
    )
    for name in ["events_variant_extract", "events_json_stats", "events_props_map"]:
        rows = Q.REGISTRY[name].spark(spark, str(d)).collect()
        assert isinstance(rows, list), name
    # the malformed rows carry no valid $.k, so the variant aggregate
    # must match the clean corpus except the bad rows' count column
    clean = {r.event_type: r.sum_k for r in
             Q.REGISTRY["events_variant_extract"].spark(spark, src).collect()}
    dirty = {r.event_type: r.sum_k for r in
             Q.REGISTRY["events_variant_extract"].spark(spark, str(d)).collect()}
    assert clean == dirty
