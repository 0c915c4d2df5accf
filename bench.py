"""Benchmark runner: times every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
SHORT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ... top-10 slowest only}, "sf": ..., "n_queries": N,
"n_errors": E}.

Round-1 lesson: the full 100-entry per-query map exceeded the driver's
line-capture and BENCH_r01.json recorded "parsed": null. The stdout line
is now kept compact (top-10 slowest queries only); the complete per-query
map is written to bench_full.json next to this script.

Each query is timed end-to-end (plan build + execution to a driver-side
collect) in a shared session, after one tiny warm-up action so JVM/codegen
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from polario_spark import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("polario_spark_bench")
    # warm-up: JVM/codegen plus one footer+row touch per table, so the
    # first measured query doesn't absorb one-time scan setup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # pre-warm the Python/Arrow worker pool so the first pandas-UDF query
    # isn't billed for 32 worker process startups
    try:
        spark.range(64).mapInPandas(
            lambda it: it, schema="id long"
        ).collect()
    except Exception:
        pass
    # fixed calibration workload, timed AFTER warm-up: a pure-JVM codegen
    # aggregation whose cost depends only on machine speed, never on the
    # query set. Cross-round comparisons should normalize per-query times
    # by calib_sec — bench runs land on whatever VM instance the round
    # gets, and instances differ by ~2x in raw speed.
    calib_start = time.perf_counter()
    spark.range(200_000_000).selectExpr(
        "sum(id * 3 + 1)", "avg(id % 7)"
    ).collect()
    calib_sec = round(time.perf_counter() - calib_start, 3)
    from polario_spark.sources.tables import TABLES

    for t in TABLES:
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()
        except Exception:
            pass

    # Each query runs REPEATS times and records the MIN: single-run times
    # in a shared 100-query session are inflated 2-10x by order effects
    # (GC pressure, state-store residue from earlier streaming queries) —
    # rounds 2 and 3 both reported phantom regressions on untouched code
    # until the affected queries were re-timed in isolation. min-of-N is
    # the standard noise floor estimator for that failure mode.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    from polario_spark.plans import release_cached_residue

    def _timed_run(fn, name: str, runs: list[float]) -> bool:
        """One timed execution appended to ``runs``; False on query error.

        (Round 8 tried an untimed ``System.gc()`` here to consolidate
        the 4-15 s full-GC pauses that land on random queries in a
        shared 117-query session. Measured effect: WORSE — the forced
        GC triggers ContextCleaner, whose asynchronous broadcast/shuffle
        cleanup then competes with the next timed region; the
        calib-normalized total went 158 -> 257 on the same code. Pause
        noise is instead handled by the adaptive extra repeat below plus
        tools/bench_tripwire.py + the SCALE.md fresh-session protocol.)
        """
        start = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - start, 3))
            return True
        except Exception as exc:  # a failing query must not hide the rest
            runs.append(-1.0)
            print(f"ERROR {name}: {exc}", file=sys.stderr)
            return False

    for name, fn in entry_mod.queries().items():
        runs: list[float] = []
        for _ in range(repeats):
            if not _timed_run(fn, name, runs):
                break
            # sweep localCheckpoint blocks OUTSIDE the timer: each repeat
            # rebuilds its plan (and re-checkpoints), so blocks from the
            # previous run are pure residue — letting them pile up across
            # ~120 queries is one of the order-effect noise mechanisms
            # SCALE.md documents
            release_cached_residue(spark)
        ok = [t for t in runs if t >= 0]
        # adaptive extra repeat: when the recorded runs disagree >2x, at
        # least one of them ate a pause min-of-N hasn't averaged out —
        # buy one more sample so the min is a real number, not the
        # smaller of two corrupted ones. Bounded: one extra run, only
        # for the handful of entries whose spread says they need it.
        if len(ok) == len(runs) and ok and max(ok) > 2 * min(ok):
            if _timed_run(fn, name, runs):
                release_cached_residue(spark)
            ok = [t for t in runs if t >= 0]
        all_runs[name] = runs
        timings[name] = min(ok) if ok and len(ok) == len(runs) else -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    n_errors = sum(1 for t in timings.values() if t < 0)
    top10 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json")
    with open(sidecar, "w") as fh:
        json.dump(
            {
                "sf": sf,
                "total_sec": total,
                "calib_sec": calib_sec,
                "n_errors": n_errors,
                "queries": timings,
                "runs": all_runs,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": top10,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_queries": len(timings),
                "n_errors": n_errors,
                "calib_sec": calib_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
