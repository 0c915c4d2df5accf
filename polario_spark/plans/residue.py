"""Session-residue cleanup for long-lived shared sessions.

A handful of diamond-shaped queries (``q11_important_parts``, the
k-means centroid loop, the dedup signature builders;
``exact_substring_dup`` and ``tfidf_top_terms`` until round 11, when
measured A/Bs showed recompute beats materializing corpus-sized
intermediates — see SCALE.md round-11 session 3) checkpoint an
intermediate with ``localCheckpoint`` so a subplan feeding multiple
consumers executes once. The surviving checkpoints all materialize
SMALL frames (dictionary- or per-doc-sized) against expensive
recomputes; a checkpoint whose frame grows with the corpus is the
anti-pattern the round-11 A/Bs quantified. Checkpoint blocks live in executor
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


def release_cached_residue(spark: SparkSession, blocking: bool = True) -> int:
    """Unpersist all persistent RDDs (localCheckpoint blocks included);
    returns how many were released.

    BLOCKING by default (round-12 A/B, RESIDUE_AB_r12.json): after a
    checkpointing x100 workload, an async ``unpersist(False)`` returned
    in ~0.05 s but left block deletion racing the NEXT workload — the
    first calibration sample after it measured 1.13-1.27 s against a
    0.11-0.16 s quiet floor (and round 11's substring checkpoint showed
    the same mechanism at 6-25x), i.e. ~1 s of deletion cost paid
    UNATTRIBUTABLY inside whatever runs next. Blocking pays the same
    ~1.0-1.2 s inside this call — bounded, attributable, outside every
    caller's timed region (bench.py and the probes sweep between
    repeats) — and the very next calibration sample is already at the
    quiet floor. Pass ``blocking=False`` only when the caller neither
    times nor immediately runs follow-on work."""
    released = 0
    for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        try:
            jrdd.unpersist(blocking)
            released += 1
        except Exception:  # a racing job holding the RDD must not fail the sweep
            pass
    return released
