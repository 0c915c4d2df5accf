"""Mechanical bench-regression tripwire (round-8, verdict item 5;
round-9: exact full-map diff + per-shard calibration).

Rounds 6 and 7 each caught a >2x per-query bench regression BY EYE
(`dedup_embedding_cosine_lsh`, then `quality_filter_funnel`) — both of
which the SCALE.md fresh-session protocol later resolved as order-effect
noise. This script makes that screen mechanical: it diffs the current
``bench_full.json`` against the previous round's numbers and prints
every entry whose min-of-N worsened more than THRESHOLD x
calib-normalized despite its code NOT being touched this round (i.e.
absent from ``queries._PRIORITY``). Those entries are exactly the ones
the SCALE.md protocol says to re-time in a fresh session before
believing either number.

Reference, in preference order (round-9, closing the r8 verdict's
"bounded from above" caveat; round-13 closes the r12 blind spot):

1. The newest COMMITTED ``bench_full.json`` as of the latest driver
   round commit — ``git show <rev>:bench_full.json`` where ``<rev>`` is
   the last commit that touched the file at or before the newest
   ``BENCH_r*.json``'s commit. That is the predecessor round's complete
   117-entry map, making the >2x screen EXACT for every entry.
2. When the newest ``BENCH_r*.json`` is NOT committed (the round-12
   failure mode: driver artifacts land untracked while the working-tree
   ``bench_full.json`` IS the candidate run), the newest committed
   ``bench_full.json`` as of HEAD — never an on-disk artifact, which
   could be the candidate itself.
3. Fallback (git unavailable / file never committed): the newest
   ``BENCH_r*.json``'s ``parsed.queries`` top-10, with absence from the
   top-10 bounding an entry's old time above by min(top-10).

Whatever the source, a reference whose every shared entry (and calib)
is byte-equal to the candidate is the candidate — the round-12 screen
printed "clean" against itself exactly this way — so that case REFUSES
(exit 2) instead of passing. ``--ref path.json`` overrides reference
selection entirely for adjudication re-runs against a specific map.

Comparisons are calib-normalized — each side's time divided by its
run's ``calib_sec``; when a side carries the round-9 sharded-bench
fields (``shard_calibs`` + ``shard_of``), the entry's OWN shard calib
is used instead of the run-wide mean. Entries under MIN_ABS_SEC raw in
both runs are ignored — a 0.05 s -> 0.15 s jitter is not a regression
signal. Exit code 1 when anything trips, so the pre-snapshot checklist
can gate on it; 2 when the reference IS the candidate (self-comparison
refusal); 3 when the REFERENCE is the suspect — a load-skewed committed
run whose burst-inflated calib terms deflate its work coefficients and
trip honest entries together (round 14, see ``reference_suspect``) —
with the next-older committed map named for adjudication.

Usage: python tools/bench_tripwire.py [new_bench_full.json]
                                      [--ref reference_bench_full.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = 2.0  # calib-normalized worsening factor that trips
MIN_ABS_SEC = 0.5  # ignore entries faster than this in BOTH runs
#: Reference-suspect screen (round 14, mechanizing SCALE.md r13's
#: protocol note): a reference calib term sitting this far above the
#: candidate's run-wide rate marks the shard as burst-inflated...
SUSPECT_CALIB_FACTOR = 1.3
#: ...provided it ALSO sits this far above the reference's OWN run-wide
#: rate — the internal-inconsistency conjunct that separates a burst
#: hitting one shard's calibration from a plain cross-machine speed
#: difference (a uniformly slower reference machine lifts every shard
#: AND the run-wide rate together, so no shard exceeds its own run's
#: norm; r14 review). Real-fixture margins: the skewed r12 shard is
#: 0.788/0.602 = 1.31x its own run, the clean map's worst is
#: 0.702/0.566 = 1.24x.
SUSPECT_INTERNAL_FACTOR = 1.25
#: ...and when more than this fraction of the trips normalize by such
#: terms, the REFERENCE is the suspect, not the entries.
SUSPECT_TRIP_FRACTION = 0.5
#: A burst that skews a reference map deflates a SHARD's worth of
#: entries, so the real event is always plural (r13's was 6 trips). A
#: single suspect trip is as likely a genuine lone regression whose
#: entry merely lives on the hottest shard — with one trip, 1 > 0.5
#: would flip the whole run to SUSPECT and route it away from the TRIP
#: protocol without ever naming the entry (r14 ADVICE). Require at
#: least this many suspect trips before reclassifying the run.
SUSPECT_MIN_TRIPS = 2


def _calib_for(run: dict, name: str) -> tuple[float, float]:
    """Entry's normalizing terms (rate_calib_sec, fixed_overhead_sec):
    its shard's when the run is sharded, else the run-wide values.

    Round 12 two-term model (verdict item 5): an entry's wall time is
    t ~ fixed + w * rate, where ``fixed`` is the per-query floor (plan +
    job launch + empty collect — measured by bench.py's 0-row query) and
    ``w`` the machine-independent work coefficient. Comparing
    w = max(t - fixed, 0) / rate across rounds removes BOTH machine
    axes; dividing t by rate alone (the pre-r12 method) over-corrects
    floor-dominated sub-second entries, which is exactly where rounds
    9-11's normalizations disagreed ~15%. Runs that pre-date the second
    term carry no calib_fixed_sec and report fixed = 0; the comparison
    loop then drops the fixed term on BOTH sides so the one transition
    round is compared under one model instead of a mixed, trip-
    suppressing one (self-review r12)."""
    shard_of = run.get("shard_of") or {}
    shard_calibs = run.get("shard_calibs") or []
    shard_fixed = run.get("shard_fixed") or []
    idx = shard_of.get(name)
    if isinstance(idx, int) and 0 <= idx < len(shard_calibs):
        rate = float(shard_calibs[idx]) or 1.0
        fixed = (
            float(shard_fixed[idx]) if idx < len(shard_fixed) else 0.0
        )
        return rate, fixed
    return (
        float(run.get("calib_sec") or 1.0),
        float(run.get("calib_fixed_sec") or 0.0),
    )


def _work_coeff(t: float, terms: tuple[float, float]) -> float:
    rate, fixed = terms
    return max(t - fixed, 0.0) / rate


def _ratio(
    old_t: float,
    new_t: float,
    old_terms: tuple[float, float],
    new_terms: tuple[float, float],
) -> float:
    """Calib-normalized worsening factor under the two-term model.

    Floor-dominated old entries (old_t at or under the old fixed floor
    -> old_w ~ 0) have no meaningful work coefficient — a near-zero
    denominator would manufacture astronomical trips even for entries
    that got FASTER in raw seconds (self-review r12). Degrade to the
    RATE-scaled raw-time ratio there (r12 advisor: a bare raw ratio
    would falsely trip any floor-level entry on a machine with a >2x
    slower per-query floor — the cross-machine axis this model exists
    to remove). And when BOTH sides are floor-dominated (r13 advisor),
    the entry carries no work signal at all — the rate-scaled raw ratio
    then measures the two machines' per-query FIXED floors, exactly the
    axis the two-term model removes, so an entry at the old floor on a
    machine whose fixed floor grew (same rate) would trip falsely.
    Both-at-floor means nothing regressed: return 1.0."""
    old_w = _work_coeff(old_t, old_terms)
    new_w = _work_coeff(new_t, new_terms)
    if old_w < 0.05:
        if new_w < 0.05:
            return 1.0
        return (new_t / new_terms[0]) / max(old_t / old_terms[0], 1e-9)
    return new_w / old_w


def _is_self_comparison(
    ref_q: dict, ref_calib: float | None, new_q: dict, new_calib: float | None
) -> bool:
    """True when the reference IS the candidate: every entry they share
    is float-equal AND the run-wide rate calib matches. Two genuinely
    distinct runs cannot produce byte-equal min-of-N wall times across
    a whole map, so exact equality is the right test — no tolerance."""
    shared = [k for k in ref_q if k in new_q]
    if not shared:
        return False
    return all(ref_q[k] == new_q[k] for k in shared) and ref_calib == new_calib


def normalized_terms(
    old_terms: tuple[float, float], new_terms: tuple[float, float]
) -> tuple[tuple[float, float], tuple[float, float]]:
    """One-transition symmetry (self-review r12): when only ONE side
    carries the second calibration term (the reference pre-dates r12),
    subtracting the floor from the new side alone deflates every ratio
    and a genuine >2x work regression can slip through the exact
    transition round the screen exists for. Compare both sides with the
    same model: fixed = 0 on both when either side lacks it."""
    if (old_terms[1] == 0.0) != (new_terms[1] == 0.0):
        return (old_terms[0], 0.0), (new_terms[0], 0.0)
    return old_terms, new_terms


def flagged_full(
    new: dict, prev_full: dict, touched: set
) -> list[tuple[str, float | None, float, float, str]]:
    """The exact-full-map trip computation, callable outside main() so
    bench.py's --fresh-retime adjudicates the SAME flagged set the
    tripwire printed (r12 verdict item 7). Returns (name, old_t, new_t,
    ratio, why) tuples; errored new entries ride with ratio=inf."""
    prev_q = prev_full["queries"]
    tripped = []
    for name, new_t in sorted(new["queries"].items()):
        if new_t < 0:
            tripped.append((name, None, new_t, float("inf"), "ERROR"))
            continue
        old_t = prev_q.get(name)
        if old_t is None or old_t < 0:
            continue
        if max(old_t, new_t) < MIN_ABS_SEC:
            continue
        old_terms, new_terms = normalized_terms(
            _calib_for(prev_full, name), _calib_for(new, name)
        )
        ratio = _ratio(old_t, new_t, old_terms, new_terms)
        if ratio > THRESHOLD and name not in touched:
            tripped.append((name, old_t, new_t, ratio, "vs exact (full map)"))
    return tripped


def reference_suspect(
    new: dict, prev_full: dict, tripped: list
) -> tuple[bool, str]:
    """(suspect, why): is the REFERENCE a load-skewed run rather than the
    tripped entries regressions?

    SCALE.md r13's operative lesson, mechanized: the driver's load-skewed
    r12 map carried one shard calib burst-inflated to 0.788 while that
    shard's ENTRY times largely missed the burst, so every entry it
    normalizes deflates ~1.4x and trips together — adjudicating against
    it "confirmed" five honest entries. The committed-fixture signature
    (tests pin it on the real r12/r13 maps): ALL six trips of the
    r13-vs-skewed-r12 diff normalize by the one shard whose rate sits
    1.40x above the candidate's run-wide rate, and the run-wide median
    ratio is 0.70 (global deflation); against the CLEAN r12 map the two
    (acquitted-class) trips normalize by a 1.25x shard — under the
    factor. Hence: suspect when more than SUSPECT_TRIP_FRACTION of the
    non-ERROR trips normalize by reference calib terms >
    SUSPECT_CALIB_FACTOR x the candidate's run-wide rate. (The verdict's
    ">50% of shared entries trip" phrasing never fires at full-map scale
    — the real event was 6 trips out of ~105 eligible — so the fraction
    is taken over the TRIPS, which is where the wall actually shows.)

    Both rate conditions must hold per trip (r14 review): the shard's
    rate above the CANDIDATE's (the verdict rule's wording) AND above
    the reference's OWN run-wide rate (the internal-inconsistency
    signature of a burst hitting one shard's calibration probe). A
    candidate benched on a merely-faster machine satisfies the first
    for every shard but never the second, so genuine regressions there
    still print as TRIPs instead of being misrouted to adjudication.
    Corollary: an UNSHARDED reference (entry rate == run-wide rate) can
    never be called suspect — a uniformly loaded run inflates calib and
    entry times together, which the normalization already absorbs; the
    per-shard burst is the one skew it cannot."""
    cand_rate = float(new.get("calib_sec") or 0.0)
    ref_rate = float(prev_full.get("calib_sec") or 0.0)
    if not cand_rate or not ref_rate:
        return False, ""
    real = [t for t in tripped if t[4] != "ERROR"]
    if not real:
        return False, ""
    sus = [
        name
        for name, _, _, _, _ in real
        if _calib_for(prev_full, name)[0] > SUSPECT_CALIB_FACTOR * cand_rate
        and _calib_for(prev_full, name)[0] > SUSPECT_INTERNAL_FACTOR * ref_rate
    ]
    if (
        len(sus) >= SUSPECT_MIN_TRIPS
        and len(sus) > SUSPECT_TRIP_FRACTION * len(real)
    ):
        return True, (
            f"{len(sus)}/{len(real)} trips normalize by reference calib "
            f"terms >{SUSPECT_CALIB_FACTOR}x the candidate's run-wide rate "
            f"({cand_rate}) and >{SUSPECT_INTERNAL_FACTOR}x the reference's "
            f"own run-wide rate ({ref_rate}) — the reference looks "
            f"load-skewed (burst-inflated shard calibs deflate its work "
            f"coefficients; SCALE.md r13)"
        )
    return False, ""


def _next_older_committed_map(full_commit: str) -> str | None:
    """The commit holding the next-older committed bench_full.json —
    the map the suspect verdict routes adjudication to."""
    try:
        out = subprocess.run(
            ["git", "rev-list", "-n1", f"{full_commit}^", "--",
             "bench_full.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
        return out or None
    except Exception:
        return None


def _newest_bench_round() -> str | None:
    rounds = sorted(
        f for f in os.listdir(REPO)
        if f.startswith("BENCH_r") and f.endswith(".json")
    )
    return rounds[-1] if rounds else None


def _load_previous_full() -> tuple[dict | None, str, str | None]:
    """The complete previous-round map from git history plus the commit
    it was read from, or (None, why, None)."""
    newest = _newest_bench_round()
    if newest is None:
        return None, "no BENCH_r*.json", None
    try:
        round_commit = subprocess.run(
            ["git", "log", "-n1", "--format=%H", "--", newest],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
        if round_commit:
            anchor, why = round_commit, f"map as of {newest}'s commit"
        else:
            # Round-12 blind spot: the driver's BENCH_r*.json can sit
            # untracked while the working-tree bench_full.json IS the
            # new run — any on-disk fallback then self-compares and the
            # screen passes vacuously. Anchor at HEAD instead: the
            # newest COMMITTED map, whatever round produced it.
            anchor, why = "HEAD", f"{newest} uncommitted -> newest committed map"
        full_commit = subprocess.run(
            ["git", "rev-list", "-n1", anchor, "--", "bench_full.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
        if not full_commit:
            return None, "bench_full.json never committed before the round", None
        blob = subprocess.run(
            ["git", "show", f"{full_commit}:bench_full.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
        return (
            json.loads(blob),
            f"git {full_commit[:9]}:bench_full.json ({why})",
            full_commit,
        )
    except Exception as exc:
        return None, f"git lookup failed: {exc}", None


def _load_previous_top10() -> tuple[dict[str, float], tuple[float, float], str]:
    """(top-10 seconds, (calib_sec, calib_fixed_sec), source) from the
    newest BENCH_r*.json."""
    rounds = sorted(
        f for f in os.listdir(REPO)
        if f.startswith("BENCH_r") and f.endswith(".json")
    )
    for fname in reversed(rounds):
        try:
            parsed = json.load(open(os.path.join(REPO, fname)))["parsed"]
            return (
                dict(parsed["queries"]),
                (
                    float(parsed.get("calib_sec") or 1.0),
                    float(parsed.get("calib_fixed_sec") or 0.0),
                ),
                fname,
            )
        except Exception:
            continue
    return {}, (1.0, 0.0), "none"


def main() -> int:
    argv = list(sys.argv[1:])
    ref_path = None
    if "--ref" in argv:
        i = argv.index("--ref")
        if i + 1 >= len(argv):
            print("tripwire: --ref requires a path argument")
            return 2
        ref_path = argv[i + 1]
        del argv[i : i + 2]
    new_path = argv[0] if argv else os.path.join(REPO, "bench_full.json")
    new = json.load(open(new_path))
    new_q: dict[str, float] = new["queries"]

    if ref_path is not None:
        prev_full, full_source = json.load(open(ref_path)), f"--ref {ref_path}"
        ref_commit = None
    else:
        prev_full, full_source, ref_commit = _load_previous_full()

    sys.path.insert(0, REPO)
    from polario_spark.queries import _PRIORITY  # noqa: E402

    touched = set(_PRIORITY)
    tripped = []

    if prev_full is not None:
        prev_q = prev_full["queries"]
        source = full_source
        if _is_self_comparison(
            prev_q, prev_full.get("calib_sec"), new_q, new.get("calib_sec")
        ):
            print(
                f"tripwire: REFUSING — reference ({source}) is the candidate "
                f"({new_path}): every shared entry and the calib are "
                "byte-equal. Commit the previous round's bench_full.json or "
                "pass an explicit --ref; a self-comparison can only print "
                "'clean'."
            )
            return 2
        tripped = flagged_full(new, prev_full, touched)
        prev_calib_desc = (
            f"{prev_full.get('calib_sec')}"
            f"+{prev_full.get('calib_fixed_sec', 0.0)}"
        )
        if ref_path is None and tripped:
            # Round 14 (r13 verdict item 5): before printing a wall of
            # TRIPs, ask whether the REFERENCE is the problem. An
            # explicit --ref is already a manual adjudication choice and
            # skips this.
            suspect, why_sus = reference_suspect(new, prev_full, tripped)
            if suspect:
                print(
                    f"tripwire: {len(new_q)} queries vs {source} "
                    f"(prev calib {prev_calib_desc} -> new "
                    f"{new.get('calib_sec')}"
                    f"+{new.get('calib_fixed_sec', 0.0)})"
                )
                # Print the FULL trip list, not just errors: adjudication
                # must start from the same evidence the verdict suppressed,
                # or a genuine regression hiding among the suspect trips is
                # never named (r14 ADVICE).
                for name, old_t, new_t, ratio, why in tripped:
                    if why == "ERROR":
                        print(f"TRIP  {name}: errored in the new run — fix "
                              f"it regardless of the reference")
                    else:
                        print(
                            f"TRIP  {name}: {old_t:.3f}s -> {new_t:.3f}s "
                            f"({ratio:.1f}x calib-normalized, {why}) — "
                            f"suspect-screen evidence, re-adjudicate below"
                        )
                print(f"tripwire: REFERENCE SUSPECT — {why_sus}")
                older = (
                    _next_older_committed_map(ref_commit)
                    if ref_commit else None
                )
                if older:
                    print(
                        f"tripwire: adjudicate against the next-older "
                        f"committed map instead: git show "
                        f"{older[:9]}:bench_full.json > /tmp/ref.json && "
                        f"python bench.py --fresh-retime --ref /tmp/ref.json"
                    )
                else:
                    print(
                        "tripwire: no older committed map found — "
                        "adjudicate with bench.py --fresh-retime --ref "
                        "<a clean map>"
                    )
                return 3
    else:
        prev_q, prev_calib, source = _load_previous_top10()
        if not prev_q:
            print("tripwire: no committed bench reference found — nothing to diff")
            return 0
        if _is_self_comparison(
            prev_q, prev_calib[0], new_q, new.get("calib_sec")
        ):
            print(
                f"tripwire: REFUSING — top-10 fallback ({source}) is the "
                f"candidate ({new_path}) — self-comparison (see above)."
            )
            return 2
        clean_prev = [t for t in prev_q.values() if t >= 0]
        # absence from the old top-10 bounds an entry's old time above;
        # an all-error previous round has no bound — degrade gracefully
        # (r8 ADVICE) by comparing only the exact entries
        old_bound = min(clean_prev) if clean_prev else None
        def old_lookup(name):
            if name in prev_q:
                t = prev_q[name]
                if t < 0:
                    return None, None, "no clean previous time"
                return t, prev_calib, "vs exact"
            if old_bound is None:
                return None, None, "all-error previous round"
            return old_bound, prev_calib, "vs top-10 floor bound"
        prev_calib_desc = f"{prev_calib}"
        for name, new_t in sorted(new_q.items()):
            if new_t < 0:
                tripped.append((name, None, new_t, float("inf"), "ERROR"))
                continue
            old_t, old_calib, why = old_lookup(name)
            if old_t is None:
                continue
            if max(old_t, new_t) < MIN_ABS_SEC:
                continue
            old_terms, new_terms = normalized_terms(
                old_calib, _calib_for(new, name)
            )
            ratio = _ratio(old_t, new_t, old_terms, new_terms)
            if ratio > THRESHOLD and name not in touched:
                tripped.append((name, old_t, new_t, ratio, why))

    print(
        f"tripwire: {len(new_q)} queries vs {source} "
        f"(prev calib {prev_calib_desc} -> new {new.get('calib_sec')}"
        f"+{new.get('calib_fixed_sec', 0.0)})"
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
