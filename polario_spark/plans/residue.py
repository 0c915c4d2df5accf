"""Session-residue cleanup for long-lived shared sessions.

A handful of diamond-shaped queries (``tfidf_top_terms``, the k-means
centroid loop; ``exact_substring_dup`` until round 11, when its measured
A/B showed recompute beats materializing the posting stream) checkpoint
an intermediate with ``localCheckpoint(eager=True)`` so a subplan
feeding multiple consumers executes once. Checkpoint blocks live in executor
block storage and are NOT freed when the query's action completes — in a
one-query-per-session cluster job that's irrelevant, but in the shared
~120-query bench/driver session every invocation leaves its blocks
behind, and the accumulated residue is one of the order-effect noise
mechanisms SCALE.md documents (phantom per-query regressions on
untouched code).

``release_cached_residue`` sweeps every persisted RDD (which is where
localCheckpoint registers its blocks) out of the session. Call it ONLY
between queries, never while a checkpointed DataFrame may still be
re-collected: localCheckpoint truncates lineage, so a swept DataFrame
cannot recompute — callers must rebuild the query (which re-checkpoints)
instead, exactly what bench.py does per repeat.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def release_cached_residue(spark: SparkSession) -> int:
    """Unpersist all persistent RDDs (localCheckpoint blocks included);
    returns how many were released. Non-blocking: block deletion
    proceeds asynchronously while the next query plans."""
    released = 0
    for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        try:
            jrdd.unpersist(False)
            released += 1
        except Exception:  # a racing job holding the RDD must not fail the sweep
            pass
    return released
