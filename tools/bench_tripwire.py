"""Mechanical bench-regression tripwire (round-8, verdict item 5).

Rounds 6 and 7 each caught a >2x per-query bench regression BY EYE
(`dedup_embedding_cosine_lsh`, then `quality_filter_funnel`) — both of
which the SCALE.md fresh-session protocol later resolved as order-effect
noise. This script makes that screen mechanical: it diffs the current
``bench_full.json`` against the previous round's committed numbers and
prints every entry whose min-of-N worsened more than THRESHOLD x
calib-normalized despite its code NOT being touched this round (i.e.
absent from ``queries._PRIORITY``). Those entries are exactly the ones
the SCALE.md protocol says to re-time in a fresh session before
believing either number.

Reference: the newest committed ``BENCH_r*.json``'s ``parsed.queries``
map. The driver keeps only the top-10 slowest there, so for an entry
absent from it the old time is bounded above by min(top-10) — absence
from the top-10 IS the evidence it was at least that fast, which is
precisely how the round-7 `quality_filter_funnel` flag was raised by
eye ("<=1.5 s in r6 — not in its top-10").

Comparisons are calib-normalized (each side's time divided by its run's
``calib_sec``) so a slower VM moment doesn't trip the wire, and entries
under MIN_ABS_SEC raw in both runs are ignored — a 0.05 s -> 0.15 s
jitter is not a regression signal. Exit code 1 when anything trips, so
the pre-snapshot checklist can gate on it.

Usage: python tools/bench_tripwire.py [new_bench_full.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = 2.0  # calib-normalized worsening factor that trips
MIN_ABS_SEC = 0.5  # ignore entries faster than this in BOTH runs


def _load_previous() -> tuple[dict[str, float], float, str]:
    """(top-10 seconds, calib_sec, source) from the newest BENCH_r*.json."""
    rounds = sorted(
        f for f in os.listdir(REPO)
        if f.startswith("BENCH_r") and f.endswith(".json")
    )
    for fname in reversed(rounds):
        try:
            parsed = json.load(open(os.path.join(REPO, fname)))["parsed"]
            return (
                dict(parsed["queries"]),
                float(parsed.get("calib_sec") or 1.0),
                fname,
            )
        except Exception:
            continue
    return {}, 1.0, "none"


def main() -> int:
    new_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "bench_full.json"
    )
    new = json.load(open(new_path))
    new_q: dict[str, float] = new["queries"]
    new_calib = float(new.get("calib_sec") or 1.0)

    prev_q, prev_calib, source = _load_previous()
    if not prev_q:
        print("tripwire: no committed BENCH_r*.json found — nothing to diff")
        return 0
    # absence from the old top-10 bounds an entry's old time from above
    old_bound = min(t for t in prev_q.values() if t >= 0)

    sys.path.insert(0, REPO)
    from polario_spark.queries import _PRIORITY  # noqa: E402

    touched = set(_PRIORITY)
    tripped = []
    for name, new_t in sorted(new_q.items()):
        if new_t < 0:
            tripped.append((name, None, new_t, float("inf"), "ERROR"))
            continue
        exact = name in prev_q
        old_t = prev_q[name] if exact else old_bound
        if old_t < 0 or max(old_t, new_t) < MIN_ABS_SEC:
            continue
        ratio = (new_t / new_calib) / max(old_t / prev_calib, 1e-9)
        if ratio > THRESHOLD and name not in touched:
            tripped.append(
                (name, old_t, new_t, ratio,
                 "vs exact" if exact else "vs top-10 floor bound")
            )

    print(
        f"tripwire: {len(new_q)} queries vs {source} "
        f"(calib {prev_calib} -> {new_calib})"
    )
    if not tripped:
        print("tripwire: clean — no untouched entry worsened "
              f">{THRESHOLD}x calib-normalized")
        return 0
    for name, old_t, new_t, ratio, why in tripped:
        old_s = f"{old_t:.3f}s" if old_t is not None else "?"
        print(
            f"TRIP  {name}: {old_s} -> {new_t:.3f}s "
            f"({ratio:.1f}x calib-normalized, {why}, not in _PRIORITY) — "
            f"apply the SCALE.md fresh-session re-time protocol before "
            f"believing either number"
        )
    return 1


if __name__ == "__main__":
    sys.exit(main())
