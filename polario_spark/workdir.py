"""Per-session scratch directories for queries that materialize data.

Round-1 lesson: roundtrip/bucketed/federated registry entries called
``tempfile.mkdtemp`` per invocation and never cleaned up, so repeated
gate + bench runs accumulated orphaned directories under /tmp. Every
scratch path now lives under one root keyed by the Spark applicationId:

- re-invoking the same query in one session WIPES and reuses its dir
  (no growth within a run);
- the whole per-app root is removed at interpreter exit (no growth
  across runs);
- concurrent sessions never collide (distinct applicationIds).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_WORK_ROOT = os.path.join(tempfile.gettempdir(), "polario_spark_work")
_cleanup_registered: set[str] = set()
_invocation_counter: dict[tuple[str, str], int] = {}


def work_dir(spark: SparkSession, kind: str) -> str:
    """A fresh, empty scratch dir for ``kind``.

    Each invocation gets its own numbered dir (``kind-0``, ``kind-1``,
    ...): re-invoking the same registry entry within a session (bench
    min-of-N, repeated gate runs) must not wipe the path a previous
    call's still-uncollected DataFrame reads from. All invocation dirs
    fall under one per-app root that is removed at interpreter exit, so
    within-session growth is bounded by invocation count and nothing
    survives the process.
    """
    app_root = os.path.join(_WORK_ROOT, spark.sparkContext.applicationId)
    key = (app_root, kind)
    n = _invocation_counter.get(key, 0)
    _invocation_counter[key] = n + 1
    path = os.path.join(app_root, f"{kind}-{n}")
    if os.path.exists(path):  # stale leftover from a recycled appId
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    if app_root not in _cleanup_registered:
        _cleanup_registered.add(app_root)
        atexit.register(shutil.rmtree, app_root, True)
    return path


_STABLE_ROOT = os.path.join(_WORK_ROOT, "stable")


def stable_work_path(kind: str, corpus: str) -> str:
    """A FIXED scratch path for artifacts a DuckDB oracle reads back,
    keyed by (artifact kind, source corpus).

    ``work_dir`` paths are keyed by applicationId and invocation count,
    so they cannot appear inside an ``oracle_sql()`` string — oracles are
    registered at import time, before any SparkSession exists. This path
    is literal and stable: the Spark query materializes to it with
    ``mode("overwrite")``, and the oracle's ``read_parquet`` sees exactly
    the bytes the query's own search consumed (the gate runs the Spark
    side, then its oracle, in one process). Determinism contract: the
    same (kind, corpus) pair yields the same string in every process, so
    an oracle baked at import from the gate corpus matches the path the
    runtime query computes from its ``sf_dir`` argument whenever — and
    only when — the two corpora are the same directory.

    ``corpus`` folds the SOURCE DATA directory into the path
    (``<root>/<basename>-<md5(normpath)[:8]>/<kind>``). Round 13's
    verdict reproduced the cross-PROCESS race the old single shared path
    carried: pytest driving the registry at sf0.001 concurrently with a
    gate mirror at sf0.01 interleaved overwrite-then-read on the one
    ``semdedup_assign`` dir and produced a one-off unattributable
    mismatch (green serially). Distinct corpora now land on distinct
    dirs, so the only remaining race is two concurrent processes on the
    SAME corpus — which ``prepare_stable_dir``'s flock tripwire already
    names loudly. The md5 suffix disambiguates same-basename corpora
    (two tmp dirs both named ``sf0.01``); the basename keeps the layout
    human-readable.

    PURE path computation — no filesystem effects. This function runs at
    registry import time, and the exit-time cleanup used to be
    registered here: any short-lived process that merely imported the
    registry (pytest collection, a tools/ script) then deleted the
    shared stable root at exit, yanking the centroid table out from
    under a concurrently running session — observed as a one-off
    ann_ivf_kmeans_topk bench failure in round 7. Writers call
    ``prepare_stable_dir`` instead, so only a process that actually
    materialized bytes schedules the cleanup.
    """
    import hashlib

    # realpath, not just abspath: a symlinked spelling of the gate corpus
    # (e.g. /data/sf0.01 -> /root/testdata/sf0.01) must key the SAME dir
    # as the baked oracle, or the entry writes to an alias-keyed path the
    # oracle never reads (r14 review)
    norm = os.path.normpath(os.path.realpath(corpus))
    tag = (
        os.path.basename(norm)
        + "-"
        + hashlib.md5(norm.encode("utf-8")).hexdigest()[:8]
    )
    return os.path.join(_STABLE_ROOT, tag, kind)


def rebind_stable_paths(sql: str, from_corpus: str, to_corpus: str) -> str:
    """Point a baked oracle's stable-path literals at another corpus's
    artifacts.

    Registry oracles bake ``stable_work_path(kind, GATE_CORPUS)`` into
    their SQL at import time; a harness that runs an entry AND its
    oracle on a different corpus (the adversary suites drive tmp-dir
    corpora) must rebind those literals to where the entry's runtime
    write actually landed, or the oracle reads the gate corpus's stale
    bytes — or nothing at all. Pure textual swap of the corpus-tag
    directory component; kinds and the stable root are untouched.

    A silent no-op here is the exact bug class corpus keying fixed
    (r14 ADVICE): if the SQL references the stable root but not the
    from-corpus tag (tag-scheme drift, a differently-spelled gate dir),
    the textual replace would leave the oracle reading another corpus's
    stale artifacts. That case now raises instead of no-opping; SQL
    with no stable-path literals at all passes through untouched."""
    frm = os.path.dirname(stable_work_path("k", from_corpus))
    to = os.path.dirname(stable_work_path("k", to_corpus))
    if from_corpus != to_corpus and _STABLE_ROOT in sql \
            and (frm + os.sep) not in sql:
        raise ValueError(
            f"rebind_stable_paths: SQL references the stable root "
            f"({_STABLE_ROOT}) but not the expected from-corpus prefix "
            f"({frm + os.sep}) — a textual rebind would silently leave "
            f"the oracle reading another corpus's artifacts. The baked "
            f"corpus tag and from_corpus ({from_corpus!r}) disagree; "
            f"pass the corpus the oracle was actually baked against."
        )
    return sql.replace(frm + os.sep, to + os.sep)


_stable_locks: dict[str, int] = {}


def prepare_stable_dir(path: str) -> str:
    """Create a stable path's directory and schedule the root's removal
    at interpreter exit. Called by the WRITING query immediately before
    ``write.mode("overwrite")`` — never at import time (see
    stable_work_path).

    Concurrency tripwire (round 11): the single-driver assumption the
    stable paths rest on is now ENFORCED as a detection, not just a
    docstring — each writer takes a process-lifetime advisory ``flock``
    on ``<path>.lock``; a second concurrent writer process gets a loud
    RuntimeWarning naming the race instead of silently interleaving
    overwrites under a reader. Best-effort: filesystems without flock
    (or an unimportable fcntl) degrade to the documented assumption.

    Exit cleanup is PER PREPARED PATH, not the shared stable root
    (round 14): registering ``rmtree(_STABLE_ROOT)`` here meant the
    first writer process to exit deleted every OTHER live process's
    corpus-keyed artifacts too — the two-process disjoint-corpus test
    caught exactly that (child B finished, its atexit yanked child A's
    dir at iter ~18.5k). Each process now removes only the dirs it
    itself materialized; a crashed process leaves at most
    #corpora x #kinds small dirs, each overwritten by the next writer."""
    os.makedirs(path, exist_ok=True)
    if path not in _stable_locks:
        try:
            import fcntl

            fd = os.open(path + ".lock", os.O_CREAT | os.O_RDWR, 0o644)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                _stable_locks[path] = fd  # held until process exit
            except OSError:
                os.close(fd)
                _stable_locks[path] = -1  # warn once per path per process
                import warnings

                warnings.warn(
                    f"another live process holds the stable work path "
                    f"{path!r}; concurrent overwrites can corrupt the "
                    f"bytes its oracle reads back (single-driver "
                    f"assumption violated)",
                    RuntimeWarning,
                    stacklevel=2,
                )
        except ImportError:
            pass
    if path not in _cleanup_registered:
        _cleanup_registered.add(path)
        # atexit is LIFO, so register in reverse execution order:
        # rmtree(path) -> unlink(path.lock) -> rmdir(parent tag dir).
        # The rmdir is best-effort and only ever removes an EMPTY tag
        # dir, so it can never yank a concurrent process's artifacts
        # (their kind dirs keep it non-empty); without it, every
        # tmp-corpus pytest run would leave one orphaned tag dir under
        # /tmp forever (r14 review). Unlinking our lock file matches the
        # pre-r14 lifecycle (the old root-level rmtree deleted lock
        # files too), and carries the same documented best-effort edge:
        # with THREE processes on one (corpus, kind), a writer starting
        # after the first holder exits misses the warning.
        atexit.register(_rmdir_quiet, os.path.dirname(path))
        atexit.register(_unlink_quiet, path + ".lock")
        atexit.register(shutil.rmtree, path, True)
    return path


def _unlink_quiet(path: str) -> None:
    try:
        os.unlink(path)
    except OSError:
        pass


def _rmdir_quiet(path: str) -> None:
    try:
        os.rmdir(path)  # refuses non-empty dirs: concurrent kinds survive
    except OSError:
        pass
