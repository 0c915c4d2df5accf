"""Blocking vs async residue release A/B (round-12, verdict item 3).

Round 11 measured an async ``unpersist(False)`` degrading the NEXT
workload 6-25x after a corpus-sized localCheckpoint (the substring
finding; ``dedup_rolling_windows``'s KEPT checkpoint shows the same
post-rep calib signature, up to 10.3). The hypothesis worth buying with
one measurement: a BLOCKING unpersist pays its deletion cost inside the
release call (attributable, bounded) instead of letting ContextCleaner's
async deletion race the next workload's timed region (unattributable,
measured 6-25x).

Protocol — one shared session, interleaved mode order so page-cache and
JVM-age state cancel across modes (the round-11 checkpoint A/B design):

    for mode in [async, blocking, async, blocking]:
        t_entry   = run dedup_rolling_windows at x100 (checkpointing entry)
        t_release = release residue with mode's unpersist(blocking)
        calib x3  = the bench calibration workload, back-to-back
        t_next    = a clean mid-cost follow-on entry (text_quality)

The verdict criterion: blocking wins when
    t_release(blocking) - t_release(async)
        < [calib + follow-on degradation left behind by async].
Record the table + verdict in SCALE.md next to the checkpoint-audit
criterion; flip plans/residue.py's default only on a measured win.

Usage: python tools/residue_ab.py [x100_dir]   (default /tmp/scale_probe/x100)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _release(spark, blocking: bool) -> tuple[int, float]:
    """Time the LIBRARY release path itself (not a copy of its loop), so
    the A/B always measures the code whose default its verdict decides
    (self-review r12)."""
    from polario_spark.plans import release_cached_residue

    start = time.perf_counter()
    released = release_cached_residue(spark, blocking=blocking)
    return released, round(time.perf_counter() - start, 3)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe/x100"
    if not os.path.isdir(sf_dir):
        print(f"missing probe corpus {sf_dir} — run tools/scale_probe.py gen 100")
        return 2

    import __spark_entry__ as entry_mod
    from polario_spark import get_spark

    queries = entry_mod.queries()
    spark = get_spark("residue_ab")
    # warm-up, same as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        spark.range(64).mapInPandas(lambda it: it, schema="id long").collect()
    except Exception:
        pass

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr(
            "sum(id * 3 + 1)", "avg(id % 7)"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).collect()
        return round(time.perf_counter() - t0, 3)

    reps = []
    for mode_blocking in [False, True, False, True]:
        t_entry = timed("dedup_rolling_windows")
        n_rel, t_release = _release(spark, mode_blocking)
        calibs = [calib(), calib(), calib()]
        t_next = timed("text_quality")
        # sweep again (same mode) so the next rep starts clean of the
        # follow-on's own residue, then let any stragglers settle
        _release(spark, mode_blocking)
        rep = {
            "mode": "blocking" if mode_blocking else "async",
            "entry_sec": t_entry,
            "released": n_rel,
            "release_sec": t_release,
            "calib_after": calibs,
            "next_sec": t_next,
        }
        reps.append(rep)
        print(rep, flush=True)
    spark.stop()

    out = {"sf_dir": sf_dir, "reps": reps}
    path = os.path.join(REPO, "RESIDUE_AB_r12.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"-> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
