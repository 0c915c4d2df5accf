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


def stable_work_path(kind: str) -> str:
    """A FIXED scratch path for artifacts a DuckDB oracle reads back.

    ``work_dir`` paths are keyed by applicationId and invocation count,
    so they cannot appear inside an ``oracle_sql()`` string — oracles are
    registered at import time, before any SparkSession exists. This path
    is literal and stable: the Spark query materializes to it with
    ``mode("overwrite")``, and the oracle's ``read_parquet`` sees exactly
    the bytes the query's own search consumed (the gate runs the Spark
    side, then its oracle, in one process).

    PURE path computation — no filesystem effects. This function runs at
    registry import time, and the exit-time cleanup used to be
    registered here: any short-lived process that merely imported the
    registry (pytest collection, a tools/ script) then deleted the
    shared stable root at exit, yanking the centroid table out from
    under a concurrently running session — observed as a one-off
    ann_ivf_kmeans_topk bench failure in round 7. Writers call
    ``prepare_stable_dir`` instead, so only a process that actually
    materialized bytes schedules the cleanup. Two *concurrent* writer
    processes on one machine would still race on the path — acceptable
    for the single-driver gate, and each writer overwrites before it
    reads.
    """
    return os.path.join(_STABLE_ROOT, kind)


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
    (or an unimportable fcntl) degrade to the documented assumption."""
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
    if _STABLE_ROOT not in _cleanup_registered:
        _cleanup_registered.add(_STABLE_ROOT)
        atexit.register(shutil.rmtree, _STABLE_ROOT, True)
    return path
