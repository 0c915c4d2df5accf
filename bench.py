"""Benchmark runner: times every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
SHORT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ... top-10 slowest only}, "sf": ..., "n_queries": N,
"n_errors": E}.

Round-1 lesson: the full 100-entry per-query map exceeded the driver's
line-capture and BENCH_r01.json recorded "parsed": null. The stdout line
is now kept compact (top-10 slowest queries only); the complete per-query
map is written to bench_full.json next to this script.

Round-9 change — SHARDED fresh sessions. One shared 117-query session
accumulates JVM state (GC pressure, state-store and broadcast residue),
and rounds 6-8 each recorded 4-15 s phantom spikes on random sub-2 s
queries — four benches produced four DIFFERENT phantom entries, every
one refuted by a fresh-session re-time (SCALE.md). The mechanism is
environmental stalls amplified by session age, so the fix is to bound
session age: the query list is split into K contiguous shards (default
4, $SPARK_GRAFT_BENCH_SHARDS) and each shard runs in its OWN subprocess
with a fresh JVM, its own warm-up, and its own calibration measurement.
Per-query times are still min-of-N within the shard; cross-round
comparisons normalize each entry by ITS shard's calib_sec
(bench_full.json carries the per-shard map; the top-level calib_sec is
the mean across shards). If the environment cannot spawn subprocesses,
the fallback rebuilds the SparkSession in-process per shard — weaker
isolation (same JVM) but still a bounded-age SQL session.

Each query is timed end-to-end (plan build + execution to a driver-side
collect), after one tiny warm-up action so JVM/codegen startup isn't
billed to the first query.

Round-13: ``python bench.py --fresh-retime [names...] [--ref map.json]``
runs the SCALE.md load-noise adjudication protocol as one command —
re-times the tripwire's flagged entries (or the given names) in a fresh
session with min-of-3 and prints ACQUITTED/CONFIRMED per entry vs the
committed reference map (or the explicit ``--ref`` one).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SHARDS = 4


def _query_names() -> list[str]:
    import __spark_entry__ as entry_mod

    return list(entry_mod.queries().keys())


def _shard_slice(names: list[str], idx: int, k: int) -> list[str]:
    """Contiguous split: shard i gets names[ceil-balanced block i]."""
    n = len(names)
    base, rem = divmod(n, k)
    start = idx * base + min(idx, rem)
    return names[start : start + base + (1 if idx < rem else 0)]


def run_shard(names: list[str], sf_dir: str, spark) -> dict:
    """Time the given queries in the provided (fresh) session.

    Returns {"calib_sec": float, "queries": {...}, "runs": {...}}.
    """
    import __spark_entry__ as entry_mod
    from polario_spark.plans import release_cached_residue
    from polario_spark.sources.tables import TABLES

    # warm-up: JVM/codegen plus one footer+row touch per table, so the
    # first measured query doesn't absorb one-time scan setup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # pre-warm the Python/Arrow worker pool so the first pandas-UDF query
    # isn't billed for 32 worker process startups
    try:
        spark.range(64).mapInPandas(lambda it: it, schema="id long").collect()
    except Exception:
        pass
    # fixed calibration workload, timed AFTER warm-up: a pure-JVM codegen
    # aggregation whose cost depends only on machine speed, never on the
    # query set. Cross-round comparisons should normalize per-query times
    # by the owning shard's calib_sec — bench runs land on whatever VM
    # instance the round gets, and instances differ by ~2x in raw speed.
    calib_start = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * 3 + 1)", "avg(id % 7)").collect()
    calib_sec = round(time.perf_counter() - calib_start, 3)
    # Second calibration term (round-12): the FIXED per-query overhead —
    # a 0-row two-stage query (plan + AQE + shuffle stage + job launch +
    # empty collect) pays everything an entry pays except data work.
    # Sub-second entries are dominated by this floor, so normalizing by
    # calib_sec alone over-corrects them on slow machines (the r9-r11
    # verdicts' normalizations disagreed ~15% by method). Model:
    # t ~ calib_fixed_sec + w * calib_sec, with w the machine-independent
    # work coefficient the tripwire compares across rounds. min-of-3: the
    # floor estimator must not absorb a GC pause.
    fixed_runs = []
    for _ in range(3):
        f0 = time.perf_counter()
        spark.range(0).selectExpr("id % 7 AS k").groupBy("k").count().collect()
        fixed_runs.append(time.perf_counter() - f0)
    calib_fixed_sec = round(min(fixed_runs), 4)
    for t in TABLES:
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()
        except Exception:
            pass

    # Each query runs REPEATS times and records the MIN: single-run times
    # in a shared session are inflated 2-10x by order effects (GC
    # pressure, state-store residue from earlier streaming queries) —
    # min-of-N is the standard noise floor estimator for that failure
    # mode, and the shard split bounds how much session age the order
    # effects have to work with.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}

    def _timed_run(fn, name: str, runs: list[float]) -> bool:
        """One timed execution appended to ``runs``; False on query error.

        (Round 8 tried an untimed ``System.gc()`` here to consolidate
        full-GC pauses; measured WORSE — ContextCleaner's async cleanup
        lands in the next timed region. See SCALE.md.)
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

    for name in names:
        fn = queries[name]
        runs: list[float] = []
        for _ in range(repeats):
            if not _timed_run(fn, name, runs):
                break
            # sweep localCheckpoint blocks OUTSIDE the timer: each repeat
            # rebuilds its plan (and re-checkpoints), so blocks from the
            # previous run are pure residue
            release_cached_residue(spark)
        ok = [t for t in runs if t >= 0]
        base_clean = bool(ok) and len(ok) == len(runs)
        # adaptive extra repeat: when the recorded runs disagree >2x, at
        # least one of them ate a pause — buy one more sample so the min
        # is a real number, not the smaller of two corrupted ones.
        if base_clean and max(ok) > 2 * min(ok):
            if _timed_run(fn, name, runs):
                release_cached_residue(spark)
            ok = [t for t in runs if t >= 0]
        all_runs[name] = runs
        # a failed BONUS run must not flip a clean entry to errored: with
        # N clean base samples the min of those is the measurement (r8
        # ADVICE) — only a base-repeat failure marks the entry errored
        timings[name] = min(ok) if base_clean else -1.0

    return {
        "calib_sec": calib_sec,
        "calib_fixed_sec": calib_fixed_sec,
        "queries": timings,
        "runs": all_runs,
    }


def _run_shard_subprocess(idx: int, k: int, sf_dir: str, out_path: str) -> bool:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_SHARD"] = f"{idx}/{k}"
    env["SPARK_GRAFT_BENCH_SHARD_OUT"] = out_path
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.PIPE,
        cwd=REPO,
    )
    if proc.returncode != 0 or not os.path.exists(out_path):
        tail = (proc.stderr or b"")[-2000:].decode(errors="replace")
        print(f"shard {idx}/{k} failed (rc={proc.returncode}): {tail}",
              file=sys.stderr)
        return False
    return True


def _shard_child() -> None:
    idx, k = map(int, os.environ["SPARK_GRAFT_BENCH_SHARD"].split("/"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = os.environ["SPARK_GRAFT_BENCH_SHARD_OUT"]
    # --fresh-retime passes an explicit entry list: the child times
    # exactly those instead of a contiguous shard slice
    explicit = os.environ.get("SPARK_GRAFT_BENCH_NAMES")
    names = explicit.split(",") if explicit else _shard_slice(
        _query_names(), idx, k
    )
    from polario_spark import get_spark

    spark = get_spark(f"polario_spark_bench_shard{idx}")
    try:
        result = run_shard(names, sf_dir, spark)
    finally:
        spark.stop()
    with open(out_path, "w") as fh:
        json.dump(result, fh)


def _retime_verdict(
    tw,
    old_t: "float | None",
    fresh_t: float,
    prev_terms: tuple,
    fresh_terms: tuple,
) -> tuple:
    """(ratio, verdict) for one fresh-retimed entry vs the committed
    reference. Pure so the screen is unit-testable. Verdicts: ERROR
    (either side missing/errored), BELOW-THRESHOLD (r13 advisor: an
    EXPLICITLY named entry under the tripwire's MIN_ABS_SEC in both
    runs is pure floor noise — flagged_full never surfaces these, so a
    by-hand name must not print CONFIRMED / exit 1 on it; advisory,
    does not count as confirmed), ACQUITTED, CONFIRMED."""
    if old_t is None or old_t < 0 or fresh_t < 0:
        return float("inf"), "ERROR"
    old_terms, new_terms = tw.normalized_terms(prev_terms, fresh_terms)
    ratio = tw._ratio(old_t, fresh_t, old_terms, new_terms)
    if max(old_t, fresh_t) < tw.MIN_ABS_SEC:
        return ratio, "BELOW-THRESHOLD"
    return ratio, "ACQUITTED" if ratio <= tw.THRESHOLD else "CONFIRMED"


def _fresh_retime(names: list[str]) -> int:
    """One-command load-noise adjudication (r12 verdict item 7): re-time
    the tripwire's flagged entries in a FRESH session and re-judge each
    against the COMMITTED reference — the SCALE.md fresh-session
    protocol that rounds 6-12 ran by hand. A flagged entry whose fresh
    work coefficient sits back inside the tripwire threshold is
    ACQUITTED (the flagged number was load noise); one that reproduces
    is CONFIRMED (a real regression — bisect it). Exit 0 = all
    acquitted / nothing flagged; 1 = at least one confirmed.

    With no names given, the flagged set is recomputed from the current
    bench_full.json vs the tripwire's committed reference via the SAME
    code path the tripwire prints (tools/bench_tripwire.flagged_full).
    ``--ref path.json`` overrides the reference — use it when the newest
    committed map is itself a flagged-as-loaded run (SCALE.md r13:
    load-skewed maps deflate work coefficients ~2x and everything
    honest looks like a regression against them); adjudicate against
    the newest CLEAN committed map instead."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_tripwire", os.path.join(REPO, "tools", "bench_tripwire.py")
    )
    tw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tw)

    ref_path = None
    if "--ref" in names:
        i = names.index("--ref")
        if i + 1 >= len(names):
            print("fresh-retime: --ref requires a path argument")
            return 1
        ref_path = names[i + 1]
        names = names[:i] + names[i + 2 :]

    cand_path = os.path.join(REPO, "bench_full.json")
    cand = json.load(open(cand_path))
    if ref_path is not None:
        prev_full, source = json.load(open(ref_path)), f"--ref {ref_path}"
    else:
        prev_full, source, _commit = tw._load_previous_full()
    if prev_full is None:
        print(f"fresh-retime: no committed reference ({source})")
        return 1
    if not names:
        from polario_spark.queries import _PRIORITY

        names = [
            name
            for name, _, new_t, _, _ in tw.flagged_full(
                cand, prev_full, set(_PRIORITY)
            )
            if new_t >= 0  # errored entries need a fix, not a re-time
        ]
    if not names:
        print("fresh-retime: nothing flagged — tripwire is clean")
        return 0
    known = set(_query_names())
    unknown = [n for n in names if n not in known]
    if unknown:
        print(f"fresh-retime: not registry entries: {', '.join(unknown)}")
        return 1
    print(f"fresh-retime: {len(names)} entries vs {source}", file=sys.stderr)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = os.path.join(REPO, "bench_retime_shard.json")
    if os.path.exists(out_path):
        os.remove(out_path)
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_SHARD"] = "0/1"
    env["SPARK_GRAFT_BENCH_SHARD_OUT"] = out_path
    env["SPARK_GRAFT_BENCH_NAMES"] = ",".join(names)
    # min-of-3: the whole point is separating a pause from the floor
    env.setdefault("SPARK_GRAFT_BENCH_REPEATS", "3")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, cwd=REPO,
    )
    if proc.returncode != 0 or not os.path.exists(out_path):
        tail = (proc.stderr or b"")[-2000:].decode(errors="replace")
        print(f"fresh-retime: session failed (rc={proc.returncode}): {tail}")
        return 1
    fresh = json.load(open(out_path))
    os.remove(out_path)
    fresh_terms = (fresh["calib_sec"], fresh.get("calib_fixed_sec", 0.0))

    verdicts = {}
    confirmed = 0
    for name in names:
        old_t = prev_full["queries"].get(name)
        fresh_t = fresh["queries"].get(name, -1.0)
        ratio, verdict = _retime_verdict(
            tw, old_t, fresh_t, tw._calib_for(prev_full, name), fresh_terms
        )
        confirmed += verdict not in ("ACQUITTED", "BELOW-THRESHOLD")
        verdicts[name] = {
            "old": old_t,
            "flagged": cand["queries"].get(name),
            "fresh": fresh_t,
            "fresh_ratio": None if ratio == float("inf") else round(ratio, 2),
            "verdict": verdict,
        }
        print(
            f"{verdict:9s} {name}: committed {old_t} -> flagged "
            f"{cand['queries'].get(name)} -> fresh {fresh_t} "
            f"({'inf' if ratio == float('inf') else f'{ratio:.2f}x'} "
            f"calib-normalized vs committed)",
            file=sys.stderr,
        )
    print(json.dumps({
        "metric": "fresh_retime",
        "reference": source,
        "calib_sec": fresh["calib_sec"],
        "calib_fixed_sec": fresh.get("calib_fixed_sec", 0.0),
        "entries": verdicts,
    }))
    return 1 if confirmed else 0


def main() -> None:
    if os.environ.get("SPARK_GRAFT_BENCH_SHARD"):
        _shard_child()
        return

    if len(sys.argv) > 1 and sys.argv[1] == "--fresh-retime":
        sys.exit(_fresh_retime(sys.argv[2:]))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    k = int(os.environ.get("SPARK_GRAFT_BENCH_SHARDS", str(DEFAULT_SHARDS)))
    names = _query_names()
    k = max(1, min(k, len(names)))

    shard_results: list[dict] = []
    shard_of: dict[str, int] = {}
    for idx in range(k):
        out_path = os.path.join(REPO, f"bench_shard_{idx}.json")
        if os.path.exists(out_path):
            os.remove(out_path)
        ok = _run_shard_subprocess(idx, k, sf_dir, out_path)
        if ok:
            result = json.load(open(out_path))
            os.remove(out_path)
        else:
            # fallback: same-process fresh SQL session (weaker isolation —
            # same JVM — but still a bounded-age session); used only when
            # the environment cannot spawn subprocesses
            from polario_spark import get_spark

            spark = get_spark(f"polario_spark_bench_shard{idx}")
            try:
                result = run_shard(_shard_slice(names, idx, k), sf_dir, spark)
            finally:
                spark.stop()
        shard_results.append(result)
        for name in result["queries"]:
            shard_of[name] = idx

    timings = {n: t for r in shard_results for n, t in r["queries"].items()}
    all_runs = {n: rr for r in shard_results for n, rr in r["runs"].items()}
    shard_calibs = [r["calib_sec"] for r in shard_results]
    calib_sec = round(sum(shard_calibs) / len(shard_calibs), 3)
    shard_fixed = [r.get("calib_fixed_sec", 0.0) for r in shard_results]
    calib_fixed_sec = round(sum(shard_fixed) / len(shard_fixed), 4)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    n_errors = sum(1 for t in timings.values() if t < 0)
    top10 = dict(sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10])
    sidecar = os.path.join(REPO, "bench_full.json")
    with open(sidecar, "w") as fh:
        json.dump(
            {
                "sf": sf,
                "total_sec": total,
                "calib_sec": calib_sec,
                "calib_fixed_sec": calib_fixed_sec,
                "shard_calibs": shard_calibs,
                "shard_fixed": shard_fixed,
                "shard_of": shard_of,
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
                "calib_fixed_sec": calib_fixed_sec,
            }
        )
    )


if __name__ == "__main__":
    main()
