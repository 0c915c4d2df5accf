"""Scratch-dir lifecycle: repeated invocation must not invalidate frames."""

from __future__ import annotations

from polario_spark import queries as Q
from polario_spark.workdir import work_dir


def test_work_dir_gives_fresh_path_per_invocation(spark):
    a = work_dir(spark, "unit-kind")
    b = work_dir(spark, "unit-kind")
    assert a != b
    import os

    assert os.path.isdir(a) and os.path.isdir(b)


def test_concurrent_stable_writer_warns(tmp_path):
    """The single-driver assumption behind stable work paths is enforced
    as a DETECTION (round 11): a second live process preparing the same
    stable dir must get a RuntimeWarning naming the race. Simulated with
    a child process that holds the flock while this process prepares."""
    import subprocess
    import sys
    import warnings

    from polario_spark import workdir

    path = str(tmp_path / "stable_kind")
    child = subprocess.Popen(
        [
            sys.executable,
            "-c",
            (
                "import sys, time; sys.path.insert(0, '/root/repo'); "
                "from polario_spark.workdir import prepare_stable_dir; "
                f"prepare_stable_dir({path!r}); print('locked', flush=True); "
                "time.sleep(30)"
            ),
        ],
        stdout=subprocess.PIPE,
    )
    try:
        assert child.stdout.readline().strip() == b"locked"
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            workdir.prepare_stable_dir(path)
        assert any(
            issubclass(w.category, RuntimeWarning)
            and "single-driver" in str(w.message)
            for w in caught
        ), [str(w.message) for w in caught]
        # same-process re-prepare (bench min-of-N) stays silent
        with warnings.catch_warnings(record=True) as caught2:
            warnings.simplefilter("always")
            workdir.prepare_stable_dir(path)
        assert not caught2
    finally:
        child.kill()
        child.wait()


def test_reinvoking_entry_keeps_first_frame_collectable(spark):
    """bench min-of-N re-invokes each registry entry in one session; the
    second invocation's scratch write must not delete the files a
    still-uncollected first frame reads from."""
    first = Q.csv_roundtrip(spark, "/root/testdata/sf0.001")
    second = Q.csv_roundtrip(spark, "/root/testdata/sf0.001")
    assert second.count() > 0
    assert first.count() > 0  # collected AFTER the second invocation wrote
