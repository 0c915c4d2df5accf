"""Property-based invariants for the layout and similarity operators,
mirroring the reference's hypothesis-driven test strategy (SURVEY.md §5)
on the net-new operator surface.

Each property is the contract scale correctness rests on:

- Morton keys: dominance monotonicity + sign-bit safety for ANY input
  distribution and any supported dimensionality — parquet min/max
  skipping is sound only if the key order respects per-column order.
- LSH near-dup pairs: for ANY vector set, the bucketed result is a
  subset of the exact all-pairs result with identical similarity values
  (approximation may only DROP pairs, never invent or mis-score them).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polario_spark.operators import similarity

coords = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**6),
        st.integers(min_value=-(10**6), max_value=10**6),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        st.integers(min_value=0, max_value=3),
    ),
    min_size=2,
    max_size=14,
)


@given(data=coords)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_morton_dominance_any_distribution(spark, data):
    from polario_spark.functions.zorder import zorder_frame

    rows = [(i, *t) for i, t in enumerate(data)]
    df = spark.createDataFrame(
        rows, "id long, a long, b long, c double, d long"
    )
    keyed = {
        r["id"]: r["__zkey"]
        for r in zorder_frame(df, ["a", "b", "c", "d"])
        .select("id", "__zkey")
        .collect()
    }
    assert all(0 <= k < 2**63 for k in keyed.values())
    pts = {r[0]: r[1:] for r in rows}
    for i, pi in pts.items():
        for j, pj in pts.items():
            if i != j and all(x <= y for x, y in zip(pi, pj)):
                assert keyed[i] <= keyed[j], (pi, pj)


vectors = st.lists(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
        min_size=8,
        max_size=8,
    ).filter(lambda v: any(abs(x) > 1e-3 for x in v)),
    min_size=2,
    max_size=10,
)


@given(vecs=vectors)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lsh_pairs_subset_of_exact_any_vectors(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.id_a, r.id_b): r.sim
        for r in similarity.cosine_pairs(df, "vec_id", "embedding", 0.3).collect()
    }
    bucketed = {
        (r.id_a, r.id_b): r.sim
        for r in similarity.cosine_pairs_bucketed(
            df, "vec_id", "embedding", 0.3, dim=8
        ).collect()
    }
    assert set(bucketed) <= set(exact), (bucketed, exact)
    for pair, sim in bucketed.items():
        assert sim == exact[pair], (pair, sim, exact[pair])
