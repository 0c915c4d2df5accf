"""Unit pins for tools/scale_probe.py's pure derivation logic.

derive_cost_shape splits a wall-clock exponent into output-cardinality
and unit-cost terms; these pins keep the classification thresholds and
the artifact field shapes stable (the committed SCALE_PROBE_r* artifacts
are diffed across rounds by the judge, so silent field drift is a
regression even when no query changed).
"""

from __future__ import annotations

import importlib.util
import math
import pathlib

_SPEC = importlib.util.spec_from_file_location(
    "scale_probe",
    pathlib.Path(__file__).resolve().parents[1] / "tools" / "scale_probe.py",
)
def _load():
    mod = importlib.util.module_from_spec(_SPEC)
    _SPEC.loader.exec_module(mod)  # type: ignore[union-attr]
    return mod


def _entry(mins, rows=None, alpha=None):
    e = {"mins": {str(k): v for k, v in mins.items()}}
    if rows:
        e["rows_out"] = {str(k): v for k, v in rows.items()}
    if alpha is None and len(mins) >= 2:
        ks = sorted(mins)
        f1, f2 = ks[-2], ks[-1]
        alpha = math.log(mins[f2] / mins[f1]) / math.log(f2 / f1)
    e["alpha_last"] = alpha
    return e


def test_output_bound_shape():
    probe = _load()
    # the committed LSH numbers: wall 8.94 -> 105.18 s, rows 0.99M -> 11.27M
    entry = _entry({30: 8.94, 100: 105.184}, {30: 993728, 100: 11266179})
    d = probe.derive_cost_shape(entry)
    assert d["cost_shape"] == "output-bound"
    assert abs(d["alpha_rows"] - 2.017) < 0.01
    assert abs(d["alpha_unit"] - 0.031) < 0.01
    # unit cost is seconds per million OUTPUT rows, flat across the step
    assert abs(d["sec_per_mrow"]["30"] - 9.0) < 0.1
    assert abs(d["sec_per_mrow"]["100"] - 9.34) < 0.1


def test_superlinear_compute_shape():
    probe = _load()
    # wall grows 10x over a 3.33x step while output only doubles:
    # per-row cost grows — the one shape that demands an operator fix
    entry = _entry({30: 10.0, 100: 100.0}, {30: 1000, 100: 2000})
    d = probe.derive_cost_shape(entry)
    assert d["cost_shape"] == "superlinear-compute"
    assert d["alpha_unit"] > 1.0


def test_linear_or_better_shape():
    probe = _load()
    entry = _entry({30: 5.0, 100: 7.0}, {30: 1000, 100: 3333})
    d = probe.derive_cost_shape(entry)
    assert d["cost_shape"] == "linear-or-better"


def test_no_rows_no_unit_split():
    probe = _load()
    # wall alpha alone (no recorded output rows): classification still
    # works off alpha_last but no unit split is fabricated
    entry = _entry({30: 5.0, 100: 6.0})
    d = probe.derive_cost_shape(entry)
    assert "alpha_rows" not in d
    assert d["cost_shape"] == "linear-or-better"


def test_single_factor_yields_nothing():
    probe = _load()
    d = probe.derive_cost_shape(_entry({30: 5.0}, {30: 10}, alpha=None))
    assert d == {}


_TW_SPEC = importlib.util.spec_from_file_location(
    "bench_tripwire",
    pathlib.Path(__file__).resolve().parents[1] / "tools" / "bench_tripwire.py",
)


def _load_tripwire():
    mod = importlib.util.module_from_spec(_TW_SPEC)
    _TW_SPEC.loader.exec_module(mod)  # type: ignore[union-attr]
    return mod


_BENCH_SPEC = importlib.util.spec_from_file_location(
    "bench_mod",
    pathlib.Path(__file__).resolve().parents[1] / "bench.py",
)


def _load_bench():
    mod = importlib.util.module_from_spec(_BENCH_SPEC)
    _BENCH_SPEC.loader.exec_module(mod)  # type: ignore[union-attr]
    return mod


def test_fresh_retime_verdict_screens_sub_threshold(monkeypatch):
    """r13 advisor: --fresh-retime with EXPLICIT names skipped the
    MIN_ABS_SEC screen flagged_full applies, so a sub-threshold entry
    passed by hand was judged on pure floor noise and could print
    CONFIRMED (exit 1) for a non-regression. Sub-threshold-in-both-runs
    now yields the advisory BELOW-THRESHOLD verdict; at-scale entries
    keep the real judgment."""
    bench = _load_bench()
    tw = _load_tripwire()
    terms = (0.5, 0.1)
    # both under MIN_ABS_SEC (0.5): advisory whatever the ratio says
    ratio, verdict = bench._retime_verdict(tw, 0.12, 0.4, terms, terms)
    assert verdict == "BELOW-THRESHOLD" and ratio > tw.THRESHOLD
    # fresh side crossed the floor: judged for real
    _, verdict = bench._retime_verdict(tw, 0.4, 5.0, terms, terms)
    assert verdict == "CONFIRMED"
    ratio, verdict = bench._retime_verdict(tw, 2.0, 2.2, terms, terms)
    assert verdict == "ACQUITTED"
    # missing / errored sides stay ERROR
    assert bench._retime_verdict(tw, None, 1.0, terms, terms)[1] == "ERROR"
    assert bench._retime_verdict(tw, 1.0, -1.0, terms, terms)[1] == "ERROR"


def test_tripwire_two_term_normalization():
    """The round-12 two-term model: w = max(t - fixed, 0) / rate, with
    shard-level terms when present and a fixed=0 degrade for pre-r12
    runs — the normalization the verdict compares rounds with, pinned so
    it stops being a judgment call."""
    tw = _load_tripwire()
    sharded = {
        "calib_sec": 0.6,
        "calib_fixed_sec": 0.2,
        "shard_of": {"q": 1},
        "shard_calibs": [0.5, 0.8],
        "shard_fixed": [0.1, 0.3],
    }
    assert tw._calib_for(sharded, "q") == (0.8, 0.3)
    assert tw._calib_for(sharded, "unknown") == (0.6, 0.2)
    legacy = {"calib_sec": 0.7}
    assert tw._calib_for(legacy, "q") == (0.7, 0.0)
    # a floor-dominated entry: 0.35s at fixed 0.3 is w=0.1/rate, and the
    # same work on a 2x-slower machine (rate 1.0, fixed 0.6, t=0.7)
    # normalizes to the SAME coefficient — rate-only division would have
    # claimed a 1.4x change
    w_fast = tw._work_coeff(0.35, (0.5, 0.3))
    w_slow = tw._work_coeff(0.7, (1.0, 0.6))
    assert abs(w_fast - w_slow) < 1e-9
    # never negative even when t < fixed (measurement jitter)
    assert tw._work_coeff(0.1, (0.5, 0.3)) == 0.0


def test_tripwire_floor_fallback_is_rate_scaled():
    """r12 advisor: the floor-dominated degrade path (old_w ~ 0) must
    still remove the machine-speed axis. An entry sitting AT the old
    floor that doubles in raw seconds on a machine whose rate calib also
    doubled has NOT regressed — a bare raw ratio would have tripped it."""
    tw = _load_tripwire()
    # old: 0.6s at (rate 0.5, fixed 0.6) -> old_w = 0 (floor-dominated);
    # new machine 2x slower (rate 1.0), same work: 1.2s raw
    r = tw._ratio(0.6, 1.2, (0.5, 0.6), (1.0, 1.2))
    assert abs(r - 1.0) < 1e-9
    # same machines, raw genuinely 3x -> trips at 3.0
    r = tw._ratio(0.6, 1.8, (0.5, 0.6), (0.5, 0.6))
    assert abs(r - 3.0) < 1e-9
    # non-floor entries keep the work-coefficient ratio
    r = tw._ratio(1.6, 2.6, (0.5, 0.6), (0.5, 0.6))
    assert abs(r - 2.0) < 1e-9
    # r13 advisor: BOTH sides floor-dominated -> no work signal; an
    # entry at the old fixed floor on a machine whose per-query fixed
    # floor doubled (same rate) must not trip — the old rate-only
    # fallback would have scored this ~1.94x
    r = tw._ratio(0.32, 0.62, (0.5, 0.3), (0.5, 0.6))
    assert r == 1.0


def test_tripwire_refuses_self_comparison():
    """r12 blind spot: a reference whose shared entries and calib are
    byte-equal to the candidate IS the candidate — must refuse, never
    print clean."""
    tw = _load_tripwire()
    q = {"a": 1.234, "b": 0.777}
    assert tw._is_self_comparison(q, 0.5, dict(q), 0.5)
    # one differing shared value -> genuinely distinct runs
    assert not tw._is_self_comparison(q, 0.5, {"a": 1.234, "b": 0.778}, 0.5)
    # identical values but different calib -> distinct runs
    assert not tw._is_self_comparison(q, 0.5, dict(q), 0.6)
    # disjoint maps -> nothing shared, not a self-comparison
    assert not tw._is_self_comparison(q, 0.5, {"c": 1.0}, 0.5)


def test_tripwire_uncommitted_round_uses_committed_map(tmp_path):
    """r12 blind spot, reference-selection half: when the newest
    BENCH_r*.json is NOT committed (driver artifacts land untracked),
    the reference must be the newest COMMITTED bench_full.json — never
    an on-disk artifact that could be the candidate itself."""
    import json as _json
    import subprocess as _sp

    tw = _load_tripwire()
    repo = tmp_path / "repo"
    repo.mkdir()
    _sp.run(["git", "init", "-q"], cwd=repo, check=True)
    _sp.run(["git", "config", "user.email", "t@t"], cwd=repo, check=True)
    _sp.run(["git", "config", "user.name", "t"], cwd=repo, check=True)
    committed = {"queries": {"a": 1.0}, "calib_sec": 0.5}
    (repo / "bench_full.json").write_text(_json.dumps(committed))
    _sp.run(["git", "add", "bench_full.json"], cwd=repo, check=True)
    _sp.run(["git", "commit", "-qm", "r12 map"], cwd=repo, check=True)
    # the driver's new round artifact: on disk, NOT committed; the
    # working-tree bench_full.json is the new run
    (repo / "BENCH_r13.json").write_text(
        _json.dumps({"parsed": {"queries": {"a": 9.0}, "calib_sec": 0.6}})
    )
    (repo / "bench_full.json").write_text(
        _json.dumps({"queries": {"a": 9.0}, "calib_sec": 0.6})
    )
    tw.REPO = str(repo)
    prev, source, commit = tw._load_previous_full()
    assert prev == committed, source
    assert "uncommitted" in source and "committed map" in source
    assert commit and commit[:9] in source
    # and when the newest round file IS committed, the anchor is that
    # round's commit (the pre-r13 behavior, unchanged)
    _sp.run(["git", "add", "BENCH_r13.json", "bench_full.json"], cwd=repo, check=True)
    _sp.run(["git", "commit", "-qm", "r13 artifacts"], cwd=repo, check=True)
    prev, source, commit2 = tw._load_previous_full()
    assert prev["queries"] == {"a": 9.0}
    assert "BENCH_r13.json's commit" in source
    # r14: the suspect verdict routes to the NEXT-OLDER committed map
    assert tw._next_older_committed_map(commit2) == commit
    assert tw._next_older_committed_map(commit) is None


def test_reference_suspect_on_real_r12_r13_maps():
    """r13 verdict item 5, pinned on the REAL committed maps: the
    driver's load-skewed r12 run (1b99bc0 — one shard calib burst-
    inflated to 0.788 while its entry times missed the burst) must be
    called out as the suspect when the r13 driver map trips against it;
    the CLEAN builder r12 map (eb20b7a) must NOT be suspect for the
    same candidate — its two floor-adjacent trips are the entries'
    problem (and were fresh-retime acquitted), not the reference's."""
    import json as _json
    import subprocess as _sp

    tw = _load_tripwire()

    def _map(rev):
        blob = _sp.run(
            ["git", "show", f"{rev}:bench_full.json"],
            cwd=tw.REPO, capture_output=True, text=True,
        ).stdout
        return _json.loads(blob) if blob else None

    skewed, clean, cand = _map("1b99bc0"), _map("eb20b7a"), _map("4c68b3f")
    if not (skewed and clean and cand):  # shallow/filtered clone
        import pytest

        pytest.skip("historical bench maps not in git history")
    tripped = tw.flagged_full(cand, skewed, set())
    suspect, why = tw.reference_suspect(cand, skewed, tripped)
    assert suspect, (why, tripped)
    assert "load-skewed" in why
    tripped_clean = tw.flagged_full(cand, clean, set())
    assert tripped_clean, "clean pairing should still carry its 2 trips"
    suspect2, _ = tw.reference_suspect(cand, clean, tripped_clean)
    assert not suspect2
    # ERROR-only trip lists carry no calib signal -> never suspect
    assert tw.reference_suspect(
        cand, skewed, [("x", None, -1.0, float("inf"), "ERROR")]
    ) == (False, "")
    # r14 review: a reference from a uniformly slower machine (every
    # shard rate lifted IN LOCKSTEP with its run-wide rate, here 2x the
    # candidate's) satisfies the vs-candidate factor for every entry but
    # never the internal-inconsistency one — genuine regressions there
    # must stay TRIPs, not be misrouted to reference adjudication
    slow_ref = dict(skewed)
    slow_ref["calib_sec"] = cand["calib_sec"] * 2.0
    slow_ref["shard_calibs"] = [cand["calib_sec"] * 2.0] * len(
        skewed.get("shard_calibs") or [1]
    )
    fake_trips = [("q", 1.0, 5.0, 3.0, "vs exact (full map)")]
    assert tw.reference_suspect(cand, slow_ref, fake_trips) == (False, "")
    # and an unsharded reference can never be suspect (entry rate ==
    # run-wide rate fails the internal factor by construction)
    unsharded = {"queries": skewed["queries"], "calib_sec": 0.9}
    assert tw.reference_suspect(cand, unsharded, fake_trips) == (False, "")
    # r14 ADVICE: a LONE trip — even one normalizing by a burst-class
    # shard — must never reclassify the run: a burst deflates a shard's
    # worth of entries (the real r13 event was 6 trips), while a single
    # trip is as likely a genuine regression living on the hottest
    # shard. 1 > 0.5*1 would have flipped it pre-fix.
    assert tw.SUSPECT_MIN_TRIPS == 2
    lone = [t for t in tripped if t[4] != "ERROR"][:1]
    assert lone
    assert tw.reference_suspect(cand, skewed, lone) == (False, "")
    # two suspect-class trips from the same skewed pairing still flip
    pair = [t for t in tripped if t[4] != "ERROR"][:2]
    if len(pair) == 2:
        sus_pair, _ = tw.reference_suspect(cand, skewed, pair)
        assert sus_pair


def test_lsh_recall_check_true_pairs(tmp_path):
    """Pin the ground-truth pair counter behind the r13 recall evidence:
    exact upper-triangle counting at the operator's round(cos,4) >= tau
    HALF_UP semantics, malformed rows shed, multi-part dirs read."""
    import importlib.util

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    spec = importlib.util.spec_from_file_location(
        "lsh_recall_check",
        pathlib.Path(__file__).resolve().parents[1]
        / "tools"
        / "lsh_recall_check.py",
    )
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)  # type: ignore[union-attr]

    d = tmp_path / "sf"
    (d / "embeddings.parquet").mkdir(parents=True)
    e0 = [1.0] + [0.0] * 63
    e1 = [1.0] + [0.0] * 63            # cos(e0,e1)=1
    e2 = [0.6, 0.8] + [0.0] * 62       # cos(e0,e2)=0.6 exactly
    e3 = [0.0, 1.0] + [0.0] * 62       # cos(e0,e3)=0, cos(e2,e3)=0.8
    bad = [float("nan")] * 64          # malformed: shed
    def write(rows, name):
        pq.write_table(
            pa.table({"embedding": pa.array(rows, pa.list_(pa.float64()))}),
            str(d / "embeddings.parquet" / name),
        )
    write([e0, e1, e2], "part-0.parquet")
    write([e3, bad], "part-1.parquet")
    n, tp = rc.true_pairs(str(d), 0.6)
    # pairs >= 0.6: (e0,e1)=1, (e0,e2)=0.6 (boundary INCLUDED — half-up
    # keeps it), (e1,e2)=0.6, (e2,e3)=0.8 -> 4; nan row excluded from n
    assert (n, tp) == (4, 4)
    # a hair under the boundary still rounds up at 4 decimals — rebuild
    # the dir with just the boundary pair
    m = np.asarray([e0, [0.599960, np.sqrt(1 - 0.599960**2)] + [0.0] * 62])
    for f in (d / "embeddings.parquet").iterdir():
        f.unlink()
    write(list(m), "part-0.parquet")
    assert rc.true_pairs(str(d), 0.6)[1] == 1
    # and below the half-up cut (0.59990 rounds to 0.5999) it does not
    m2 = np.asarray([e0, [0.599900, np.sqrt(1 - 0.599900**2)] + [0.0] * 62])
    for f in (d / "embeddings.parquet").iterdir():
        f.unlink()
    write(list(m2), "part-0.parquet")
    assert rc.true_pairs(str(d), 0.6)[1] == 0
    # r13 advisor: the full well_formed_vectors contract — ragged rows
    # (previously: object-dtype crash in np.asarray), NULL rows, NULL
    # components, and over-VEC_COMPONENT_CAP components are all shed
    # BEFORE the denominator forms, never inflating true pairs
    for f in (d / "embeddings.parquet").iterdir():
        f.unlink()
    ragged = [1.0] * 63                       # wrong length: shed
    overcap = [5e3] + [0.0] * 63              # |x| > 1e3: shed
    nullcomp = [None] + [1.0] * 63            # NULL component: shed
    pq.write_table(
        pa.table(
            {
                "embedding": pa.array(
                    [e0, e1, ragged, None, overcap, nullcomp],
                    pa.list_(pa.float64()),
                )
            }
        ),
        str(d / "embeddings.parquet" / "part-0.parquet"),
    )
    assert rc.true_pairs(str(d), 0.6) == (2, 1)


def test_clustered_probe_exact_topk_mirrors_brute_force_semantics(tmp_path):
    """The r14 clustered-recall evidence rests on clustered_probe's numpy
    ground truth claiming brute_force_topk's exact semantics: round(cos,4),
    self excluded, nid-ascending tie-break, queries = id % 97 == 0,
    well-formed screen before the denominator. Pin all of it on a corpus
    built to exercise each clause."""
    import importlib.util

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    spec = importlib.util.spec_from_file_location(
        "clustered_probe",
        pathlib.Path(__file__).resolve().parents[1]
        / "tools"
        / "clustered_probe.py",
    )
    cp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cp)  # type: ignore[union-attr]

    d = tmp_path / "sf"
    (d / "embeddings.parquet").mkdir(parents=True)
    e = lambda *v: list(v) + [0.0] * (64 - len(v))
    rows = [
        (0, e(1.0)),            # query (0 % 97 == 0)
        (1, e(1.0)),            # cos 1.0 with the query
        (2, e(0.6, 0.8)),       # cos 0.6
        (3, e(0.8, 0.6)),       # cos 0.8
        (4, e(0.6, -0.8)),      # cos 0.6 — TIES with nid 2; 2 must rank first
        (5, e(-1.0)),           # cos -1.0 (still a neighbor; k=5 needs 5)
        (6, e(0.0, 1.0)),       # cos 0.0
        (7, [float("nan")] * 64),   # malformed: shed entirely
        (8, e(1.0)[:63]),           # ragged: shed (not 64 long)
        (97, e(0.9, 0.435890)),     # second query (97 % 97 == 0)
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float64())
                ),
            }
        ),
        str(d / "embeddings.parquet" / "part-0.parquet"),
    )
    ids, u = cp._load_matrix(str(d))
    assert list(ids) == [0, 1, 2, 3, 4, 5, 6, 97]  # 7 and 8 shed, sorted
    # block=1 forces one query per GEMM stripe, exercising the
    # multi-block boundary indexing (qids[b + row]) the default
    # block=256 never would with 2 queries (r14 review)
    truth = cp.exact_topk(ids, u, k=5, block=1)
    assert truth == cp.exact_topk(ids, u, k=5)  # blocking-invariant
    assert set(truth) == {0, 97}
    top0, kth0 = truth[0]
    # sim desc: 1(1.0), 97(0.9), 3(0.8), then the 0.6 TIE between 2 and 4
    # -> nid-ascending admits BOTH (k=5), and the kth (5th-best) sim is 0.6
    assert top0 == {1, 97, 3, 2, 4}
    assert kth0 == 0.6
    # self is never its own neighbor
    assert 0 not in top0
    assert 97 not in truth[97][0]


def test_gen_cluster_geometry_is_deterministic_and_on_spec(spark, tmp_path):
    """The committed r14 clustered-geometry measurements (IVF recall
    curves, LSH bucket tables) are only re-checkable if gen-cluster
    keeps producing the SAME corpora: pin determinism (two generations
    collect identical rows — hash-seeded Box-Muller, no RNG state) and
    the geometry spec (sqrt-skewed cluster masses with the heaviest
    well above the mean; within-cluster cosine ~0.5; cross-cluster at
    the random-direction floor) on a small factor over sf0.001."""
    import os
    import shutil
    import subprocess
    import sys

    import numpy as np

    probe = _load()
    src = tmp_path / "x2"
    src.mkdir()
    (src / "_DONE").write_text("ok\n")
    for t in probe.DIMS + [n for n in probe.KEYED if n != "embeddings"]:
        (src / f"{t}.parquet").mkdir()  # symlink targets; never read here

    def gen_rows():
        # subprocess: generate_cluster runs get_spark()+stop(), which
        # would kill the shared test session's context if run in-process
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
            SCALE_PROBE_OUT=str(tmp_path),
        )
        subprocess.run(
            [
                sys.executable,
                str(
                    pathlib.Path(__file__).resolve().parents[1]
                    / "tools"
                    / "scale_probe.py"
                ),
                "gen-cluster",
                "2",
            ],
            env=env,
            check=True,
            capture_output=True,
        )
        df = spark.read.parquet(str(tmp_path / "xc2" / "embeddings.parquet"))
        rows = sorted(
            (r.vec_id, r.label, tuple(r.embedding)) for r in df.collect()
        )
        shutil.rmtree(tmp_path / "xc2")
        return rows

    rows1, rows2 = gen_rows(), gen_rows()
    assert rows1 == rows2  # bitwise deterministic across generations
    n = len(rows1)
    assert n == 1000  # sf0.001 embeddings (500) x factor 2
    labels = np.asarray([r[1] for r in rows1])
    m = np.asarray([r[2] for r in rows1], dtype=np.float64)
    assert labels.min() >= 0 and labels.max() < probe.CLUSTER_COUNT
    # sqrt-skew: the heaviest cluster must carry several times the mean
    counts = np.bincount(labels, minlength=probe.CLUSTER_COUNT)
    assert counts.max() >= 4 * counts[counts > 0].mean()
    u = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    big = np.argmax(counts)
    members = u[labels == big]
    w = members @ members.T
    iu = np.triu_indices(len(members), 1)
    assert 0.35 < w[iu].mean() < 0.65  # within-cluster cos ~0.5
    # cross-cluster pairs sit at the random-direction floor
    a = u[labels == labels[labels != big][0]][:40]
    x = (members[:40] @ a.T).ravel()
    assert abs(float(x.mean())) < 0.15 and float(np.abs(x).max()) < 0.6


def test_emit_artifact_calib_series_merge(tmp_path, monkeypatch):
    """r14 review: a partial probe run extending a slot to a new factor
    must not erase the calib series behind the earlier factors'
    committed numbers (the x300 cluster-count run dropped 30/100).
    Same-slot merges now union factors and CONCATENATE same-factor
    series; curve entries keep their deep-merge."""
    import json
    import os

    probe = _load()
    art = tmp_path / "art.json"
    monkeypatch.setenv("SCALE_PROBE_ARTIFACT", str(art))
    probe._emit_artifact({
        "mode": "m", "factors": [30, 100],
        "results": {
            "__calib__": {"30": [0.6, 0.2], "100": [0.61]},
            "q": {"mins": {"30": 1.0, "100": 3.0}},
        },
    })
    probe._emit_artifact({
        "mode": "m", "factors": [100, 300],
        "results": {
            "__calib__": {"100": [0.62], "300": [0.5]},
            "q": {"mins": {"100": 2.9, "300": 9.0}},
        },
    })
    merged = json.load(open(art))["runs"]["m"]["results"]
    assert merged["__calib__"] == {
        "30": [0.6, 0.2], "100": [0.61, 0.62], "300": [0.5],
    }
    assert merged["q"]["mins"] == {"30": 1.0, "100": 2.9, "300": 9.0}


def test_vector_screen_modal_dim_tie_breaks_deterministically():
    """r14 ADVICE: on a pathological 50/50 corpus the modal-dim default
    must not depend on set iteration order; ties break to the smallest
    tied length, identically on every Python build."""
    vs_spec = importlib.util.spec_from_file_location(
        "vector_screen",
        pathlib.Path(__file__).resolve().parents[1]
        / "tools"
        / "vector_screen.py",
    )
    vs = importlib.util.module_from_spec(vs_spec)
    vs_spec.loader.exec_module(vs)  # type: ignore[union-attr]

    rows = [[1.0] * 3] * 5 + [[1.0] * 7] * 5  # exact 50/50 tie
    _, m, dim = vs.screen_vectors(rows)
    assert dim == 3
    assert m.shape == (5, 3)
    # clear mode still wins regardless of magnitude ordering
    _, _, dim2 = vs.screen_vectors(rows + [[1.0] * 7])
    assert dim2 == 7


def _load_clustered_probe():
    spec = importlib.util.spec_from_file_location(
        "clustered_probe",
        pathlib.Path(__file__).resolve().parents[1]
        / "tools"
        / "clustered_probe.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # type: ignore[union-attr]
    return mod


def test_quantize_like_operator_matches_spark_quantizer(spark):
    """r14 verdict item 4: the numpy quantizer behind the int8 exact
    ground truth must reproduce _quantize_exprs byte-for-byte — HALF_UP
    (away from zero) on exact .5 boundaries where np.round's half-even
    would drift, and per-row max-abs scaling. Pinned against the REAL
    Spark expression over vectors engineered to hit .5 boundaries."""
    import numpy as np

    cp = _load_clustered_probe()
    # rows whose x*127/max|x| lands exactly on .5: with max|x|=127,
    # x=2.5 -> q=round(2.5)=3 HALF_UP (np.round would give 2);
    # x=-2.5 -> -3 (np.round: -2); plus a generic irrational-ish row
    rows = [
        [127.0, 2.5, -2.5, 3.5, -3.5] + [0.0] * 59,
        [1.0, 0.25, -0.75, 0.5] + [0.1] * 60,
        [-64.0, 63.5, 1.0, -0.5] + [0.01] * 60,
    ]
    u = np.asarray(rows, dtype=np.float64)
    got = cp.quantize_like_operator(u)
    assert got[0, 1] == 3.0 and got[0, 2] == -3.0
    assert got[0, 3] == 4.0 and got[0, 4] == -4.0

    from pyspark.sql import functions as F

    from polario_spark.operators.similarity import _quantize_exprs

    df = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(rows)],
        "i long, v array<double>",
    )
    scale, quant = _quantize_exprs("v", "spark", width="bigint")
    out = (
        df.withColumns({"__qscale": F.expr(scale)})
        .withColumns({"__qv": F.expr(quant)})
        .orderBy("i")
        .collect()
    )
    for i, r in enumerate(out):
        assert list(got[i].astype(int)) == list(r["__qv"]), (i, r["__qv"])
    # scale invariance: quantizing 1000x the row gives identical codes
    assert (cp.quantize_like_operator(u * 1000.0) == got).all()


def test_exact_topk_quantized_scale_and_semantics():
    """The int8 exact truth ranks by the INTEGER-dot cosine: a pair that
    the float truth separates but quantization collapses must tie (and
    break nid-ascending) in the quantized truth — the scale difference
    that made the float kth unusable for int8 tie-recall."""
    import numpy as np

    cp = _load_clustered_probe()
    # qid 0 (stride hit: 0 % 97 == 0); neighbors 1 and 2 nearly parallel
    # to it. The perturbation must (a) survive the float truth's
    # round(cos, 4) — cos(e0, e0 + c*sum(e1..e32)) ~ 1 - 16c^2, so the
    # 32-dim spread puts the gap at the 4th decimal — while (b) every
    # component quantizes to 0 (|c| * 127 < 0.5), so both neighbors'
    # int8 codes equal the query's and the integer-dot cosine ties at
    # exactly 1.0. (A single-component perturbation cannot do both:
    # code 0 forces c < 0.004, which rounds the float cosine to 1.0.)
    base = np.zeros(64)
    base[0] = 1.0
    v1 = base.copy()
    v1[1:33] = 0.003
    v2 = base.copy()
    v2[1:33] = 0.0035
    far = np.zeros(64)
    far[1] = 1.0
    ids = np.asarray([0, 1, 2, 3], dtype=np.int64)
    u = np.stack([base, v1, v2, far])
    u = u / np.linalg.norm(u, axis=1, keepdims=True)
    tq = cp.exact_topk_quantized(ids, u, k=2)
    top_ids, kth = tq[0]
    # sub-resolution components quantize to 0: vectors 1,2 tie with
    # cosine 1.0 to the query; nid-ascending keeps {1, 2}, kth exactly 1.0
    assert top_ids == {1, 2}
    assert kth == 1.0
    # float truth at the same k separates them without a tie at 1.0
    tf = cp.exact_topk(ids, u, k=2)
    assert tf[0][0] == {1, 2} and tf[0][1] < 1.0
