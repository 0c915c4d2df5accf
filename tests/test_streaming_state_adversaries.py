"""Round-9 streaming STATE adversary suite: semantics that only appear
when keyed state is evicted or carried ACROSS micro-batches.

The registry's streaming entries drain the whole fixture with
``processAllAvailable`` — a static directory arrives as ONE micro-batch,
so keyed state never crosses a trigger boundary and the watermark never
evicts anything before the drain ends. These probes feed adversarial
multi-batch sequences (file drops between processAllAvailable calls, so
batch order is deterministic) to pin the state behaviors a 100 TB
deployment actually lives with — keyed-dedup eviction, sessionizer
delta/timeout semantics, ledger replay idempotence, checkpoint restart,
and the frozen stream-static dim snapshot:

1. **Keyed-dedup re-admission** (`dropDuplicates` + watermark): once the
   watermark passes a key's eviction horizon its state is dropped and a
   recurrence is admitted as never-seen. That is the documented cost of
   BOUNDING dedup state; the probe pins it so the contract stays
   explicit — streaming dedup is exact within the watermark horizon,
   at-least-once beyond it (global exactness = the batch dedup family).

2. **Sessionizer contract** (`sessionize_transform`): state is O(1) per
   key (last_ts only; per-trigger deltas are emitted, not cumulative
   counts), bounded by EventTimeTimeout eviction. The pinned behaviors:
   ordered arrival == the batch event-time oracle exactly (including
   across a mid-session trigger and across an eviction); stragglers
   older than the watermark are DROPPED at the stateful operator's
   input; stragglers inside the allowed lateness are stitched at their
   ARRIVAL position. Each divergence from the batch oracle is measured
   in-test with both engines' numbers, not assumed away.
"""

from __future__ import annotations

import uuid
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from polario_spark.streaming.events import drain_sessions, sessionize_transform

_DEDUP_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_SESS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _write_dedup_batch(src, name, rows):
    """rows: (user_id, event_type, ts)."""
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            }
        ),
        str(src / name),
    )


def _write_sess_batch(src, name, rows, start_id):
    """rows: (user_id, ts); event_id assigned sequentially."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(
                    range(start_id, start_id + len(rows)), pa.int64()
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        ),
        str(src / name),
    )


def _start_memory_query(stream_df, tmp_path, mode):
    name = f"probe_{uuid.uuid4().hex[:8]}"
    query = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"chk_{name}"))
        .start()
    )
    return name, query


def test_plain_dropduplicates_state_is_never_evicted(spark, tmp_path):
    """THE TRAP this suite exists for: with plain ``dropDuplicates`` a
    watermark does NOT evict key state when the event-time column is not
    among the dedup keys — a (user 1, click) admitted at 10:00 still
    suppresses its duplicate at 23:00, two full batches after the
    watermark (21:00 delay 1 h) passed any plausible horizon. State grows
    with |distinct keys| forever; the watermark only filters late input.
    This pins WHY dedup_counts uses dropDuplicatesWithinWatermark — if
    Spark ever changes plain-dropDuplicates eviction, this fails and the
    choice should be revisited."""
    src = tmp_path / "src"
    src.mkdir()
    _write_dedup_batch(
        src,
        "b1.parquet",
        [
            (1, "click", datetime(2026, 1, 1, 10, 0)),
            (9, "view", datetime(2026, 1, 1, 20, 0)),  # watermark -> 19:00
        ],
    )
    stream = (
        spark.readStream.schema(_DEDUP_SCHEMA)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "event_type"])
    )
    name, query = _start_memory_query(stream, tmp_path, "append")
    try:
        query.processAllAvailable()
        # an intermediate batch advances the watermark AND gives the
        # state store a cleanup opportunity it (correctly) does not take
        _write_dedup_batch(
            src, "b2.parquet", [(9, "scroll", datetime(2026, 1, 1, 22, 0))]
        )
        query.processAllAvailable()
        _write_dedup_batch(
            src, "b3.parquet", [(1, "click", datetime(2026, 1, 1, 23, 0))]
        )
        query.processAllAvailable()
    finally:
        query.stop()
    clicks = [
        r
        for r in spark.table(name).collect()
        if r.user_id == 1 and r.event_type == "click"
    ]
    assert len(clicks) == 1, (
        "plain dropDuplicates suppressed forever (unbounded state)"
    )


def test_within_watermark_dedup_readmits_key_after_horizon(spark, tmp_path):
    """The operator dedup_counts actually uses: state for (1, click) at
    10:00 expires once the watermark (21:00 after b2, delay 1 h) passes
    its first-seen time + delay, so the recurrence at 23:00 is
    RE-ADMITTED. Bounded state = at-least-once beyond the horizon."""
    src = tmp_path / "src"
    src.mkdir()
    _write_dedup_batch(
        src,
        "b1.parquet",
        [
            (1, "click", datetime(2026, 1, 1, 10, 0)),
            (9, "view", datetime(2026, 1, 1, 20, 0)),
        ],
    )
    stream = (
        spark.readStream.schema(_DEDUP_SCHEMA)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    name, query = _start_memory_query(stream, tmp_path, "append")
    try:
        query.processAllAvailable()
        _write_dedup_batch(
            src, "b2.parquet", [(9, "scroll", datetime(2026, 1, 1, 22, 0))]
        )
        query.processAllAvailable()
        _write_dedup_batch(
            src, "b3.parquet", [(1, "click", datetime(2026, 1, 1, 23, 0))]
        )
        query.processAllAvailable()
    finally:
        query.stop()
    clicks = [
        r
        for r in spark.table(name).collect()
        if r.user_id == 1 and r.event_type == "click"
    ]
    assert len(clicks) == 2, (
        "evicted-key recurrence must be re-admitted (bounded-state dedup)"
    )


def test_within_watermark_dedup_exact_inside_horizon(spark, tmp_path):
    """The exactness half of the contract: a duplicate arriving in a
    later micro-batch but INSIDE the watermark horizon is suppressed. A
    NULL-event-time key is deduped WITHIN a batch but its state does not
    survive the trigger (expiry treats the unknown event time as already
    past), so its cross-batch duplicate is re-admitted — measured here
    and documented on dedup_counts; exclude or default NULL event times
    upstream when exact NULL-key dedup matters."""
    src = tmp_path / "src"
    src.mkdir()
    _write_dedup_batch(
        src,
        "b1.parquet",
        [
            (1, "click", datetime(2026, 1, 1, 10, 0)),
            (2, "view", None),
            (9, "view", datetime(2026, 1, 1, 10, 30)),  # watermark -> 08:30
        ],
    )
    stream = (
        spark.readStream.schema(_DEDUP_SCHEMA)
        .parquet(str(src))
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    name, query = _start_memory_query(stream, tmp_path, "append")
    try:
        query.processAllAvailable()
        _write_dedup_batch(
            src,
            "b2.parquet",
            [
                (1, "click", datetime(2026, 1, 1, 10, 45)),  # in-horizon dup
                (2, "view", None),                            # NULL-ts dup
            ],
        )
        query.processAllAvailable()
    finally:
        query.stop()
    rows = spark.table(name).collect()
    clicks = [r for r in rows if r.user_id == 1 and r.event_type == "click"]
    nullts = [r for r in rows if r.user_id == 2 and r.event_type == "view"]
    assert len(clicks) == 1, "in-horizon duplicate must be suppressed"
    # NULL-ts key: state expired at the trigger boundary -> the batch-2
    # duplicate is re-admitted (2 rows). In-batch dedup still holds: each
    # batch contributed exactly one row despite any within-batch dups.
    assert len(nullts) == 2, (
        "NULL-ts key state must not survive the micro-batch (measured)"
    )


def _drain_sessions_multibatch(spark, tmp_path, batches):
    """Run sessionize_transform over a file stream, feeding ``batches``
    (lists of (user_id, ts)) strictly one micro-batch at a time."""
    src = tmp_path / f"sess_{uuid.uuid4().hex[:8]}"
    src.mkdir()
    _write_sess_batch(src, "b0.parquet", batches[0], 0)
    out = sessionize_transform(
        spark.readStream.schema(_SESS_SCHEMA).parquet(str(src))
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    query = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(src) + "_chk")
        .start()
    )
    try:
        query.processAllAvailable()
        for i, rows in enumerate(batches[1:], start=1):
            _write_sess_batch(src, f"b{i}.parquet", rows, 100 * i)
            query.processAllAvailable()
    finally:
        query.stop()
    totals = (
        f"SELECT user_id, sum(d_sessions) AS n_sessions,"
        f" sum(d_events) AS total_events FROM {name} GROUP BY user_id"
    )
    return {
        r.user_id: (r.n_sessions, r.total_events)
        for r in spark.sql(totals).collect()
    }


def test_stateful_sessions_match_batch_oracle_on_ordered_arrival(spark, tmp_path):
    """When per-user arrival is event-time-ordered, state carried across
    micro-batches MID-SESSION must stitch exactly like the batch
    lag/cumsum oracle: 10:00,10:10 | 10:20 (same session across the
    trigger), 12:00 (new) => 2 sessions, 4 events."""
    out = _drain_sessions_multibatch(
        spark,
        tmp_path,
        [
            [(7, datetime(2026, 1, 1, 10, 0)), (7, datetime(2026, 1, 1, 10, 10))],
            [(7, datetime(2026, 1, 1, 10, 20)), (7, datetime(2026, 1, 1, 12, 0))],
        ],
    )
    assert out == {7: (2, 4)}


def _batch_session_oracle(spark, rows):
    """Event-time lag/cumsum sessionization over the given (user, ts)
    rows — the exact-semantics reference the streaming contract is
    measured against."""
    sdf = spark.createDataFrame(list(rows), "user_id long, ts timestamp")
    gap = F.unix_micros("ts") - F.unix_micros(
        F.lag("ts").over(Window.partitionBy("user_id").orderBy("ts"))
    )
    batch = (
        sdf.withColumn(
            "new_s",
            (F.coalesce(gap, F.lit(10**18)) > 30 * 60 * 1_000_000).cast("int"),
        )
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r.user_id: (r.n_sessions, r.n) for r in batch}


def test_stateful_sessions_drop_stragglers_beyond_watermark(spark, tmp_path):
    """A cross-batch straggler OLDER than the watermark is dropped at the
    stateful operator's input (standard watermark semantics — this is
    what makes EventTimeTimeout eviction sound). Arrival: batch 1 =
    10:00, 12:00 (watermark -> 11:00 at delay 1 h); batch 2 = straggler
    10:05 (< 11:00, DROPPED) + successor 12:10 (10 min gap, same
    session). Streaming: (2 sessions, 3 events); the batch event-time
    oracle over all four rows says (2, 4) — the divergence is exactly
    the dropped late row, pinned here with both numbers."""
    rows_b1 = [(7, datetime(2026, 1, 1, 10, 0)), (7, datetime(2026, 1, 1, 12, 0))]
    rows_b2 = [(7, datetime(2026, 1, 1, 10, 5)), (7, datetime(2026, 1, 1, 12, 10))]
    out = _drain_sessions_multibatch(spark, tmp_path, [rows_b1, rows_b2])
    assert out == {7: (2, 3)}
    assert _batch_session_oracle(spark, rows_b1 + rows_b2) == {7: (2, 4)}


def test_stateful_sessions_stitch_inhorizon_stragglers_in_arrival_order(
    spark, tmp_path
):
    """A straggler INSIDE the allowed lateness is admitted but stitched
    at its ARRIVAL position (state is O(1)/key — last_ts only). Arrival:
    batch 1 = 10:00, 11:30 (watermark -> 10:30); batch 2 = straggler
    10:45 (admitted: newer than the watermark, older than last_ts) +
    successor 12:30.

    - streaming: b1 opens sessions at 10:00 and 11:30 (90 min gap); in
      b2 the straggler's gap vs last_ts=11:30 is negative (no session)
      and the successor 12:30 measures 105 min from the STRAGGLER ->
      opens one more => (3 sessions, 4 events).
    - batch event-time oracle: 10:00 |45'| 10:45 |45'| 11:30 |60'| 12:30
      — every gap exceeds 30 min => (4 sessions, 4 events).

    The divergence is the operator's documented contract; this test
    fails if someone silently "fixes" it into unbounded-state buffering
    or breaks the within-batch sort."""
    rows_b1 = [(7, datetime(2026, 1, 1, 10, 0)), (7, datetime(2026, 1, 1, 11, 30))]
    rows_b2 = [(7, datetime(2026, 1, 1, 10, 45)), (7, datetime(2026, 1, 1, 12, 30))]
    out = _drain_sessions_multibatch(spark, tmp_path, [rows_b1, rows_b2])
    assert out == {7: (3, 4)}
    assert _batch_session_oracle(spark, rows_b1 + rows_b2) == {7: (4, 4)}


def test_stateful_sessions_state_evicted_after_idle_gap(spark, tmp_path):
    """Eviction correctness across an actual timeout: user 7 goes idle,
    another user's events advance the watermark past 7's last_ts + gap
    (EventTimeTimeout fires, state dropped), then user 7 returns with an
    on-time event. The return must count as a NEW session and the
    already-emitted deltas must survive the eviction — totals are exact:
    user 7 = (2 sessions, 2 events), user 9 = (2, 2) (their own 2 h gap
    also splits). This is the bounded-state half the old NoTimeout
    design could not provide."""
    out = _drain_sessions_multibatch(
        spark,
        tmp_path,
        [
            # b1: user 7 active; user 9's 12:00 -> watermark 11:00 > 10:00+30'
            [(7, datetime(2026, 1, 1, 10, 0)), (9, datetime(2026, 1, 1, 12, 0))],
            # b2: only user 9 -> user 7 has no data, timeout fires, state
            # removed (watermark moves to 13:00)
            [(9, datetime(2026, 1, 1, 14, 0))],
            # b3: user 7 returns, on-time -> fresh state, new session
            [(7, datetime(2026, 1, 1, 15, 0))],
        ],
    )
    assert out == {7: (2, 2), 9: (2, 2)}


def test_foreachbatch_ledger_replay_is_idempotent(spark, tmp_path):
    """Restart semantics: a recovered query RE-DELIVERS the last
    uncommitted micro-batch with the SAME batch_id. The ledger sink must
    absorb the replay — sink(df, n) twice == once — or every restart
    double-counts that batch's partials (the pre-fix append-mode ledger
    did exactly that, invisibly: single drains never replay)."""
    from polario_spark.streaming.events import ledger_sink, read_ledger_totals

    out = str(tmp_path / "partials")
    sink = ledger_sink(out)
    b0 = spark.createDataFrame(
        [("click", 1.0), ("click", 2.0), ("view", 4.0)],
        "event_type string, value double",
    )
    b1 = spark.createDataFrame(
        [("click", 8.0)], "event_type string, value double"
    )
    sink(b0, 0)
    sink(b0, 0)  # the replay
    sink(b1, 1)
    totals = {
        r.event_type: (r.n_events, r.sum_value)
        for r in read_ledger_totals(spark, out).collect()
    }
    assert totals == {"click": (3, 11.0), "view": (1, 4.0)}


def test_foreachbatch_ledger_empty_stream_yields_empty_totals(spark, tmp_path):
    """Zero micro-batches -> no ledger directory -> empty totals with the
    final schema, not a missing-path error (the old design needed a seed
    write for this; a root-level seed file would now conflict with the
    batch_id=N partition layout)."""
    from polario_spark.streaming.events import read_ledger_totals

    out = str(tmp_path / "never_written")
    df = read_ledger_totals(spark, out)
    assert df.collect() == []
    assert [f.name for f in df.schema.fields] == [
        "event_type",
        "n_events",
        "sum_value",
    ]


def test_sessionizer_state_survives_restart_via_checkpoint_and_ledger(
    spark, tmp_path
):
    """End-to-end exactly-once across a STOP/RESTART: sessionize_transform
    drained through the replay-idempotent ledger sink (durable, unlike
    the memory sink), with applyInPandasWithState state recovered from
    the checkpoint. Run 1 processes a mid-session prefix (10:00, 10:10)
    and stops; run 2 is a NEW query on the same checkpoint absorbing the
    continuation (10:20 same session, 12:00 new). Correct totals require
    BOTH halves: the recovered last_ts=10:10 state (else 10:20 opens a
    spurious session -> 3) and ledger replay-idempotence (else a
    re-delivered batch double-counts events). Expected: (2 sessions,
    4 events). This also freezes the state schema (last_us long) into a
    checkpoint — if a future edit changes it incompatibly, this test is
    what fails."""
    from pyspark.sql import functions as SF

    src = tmp_path / "evsrc"
    src.mkdir()
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "ledger")

    # same idempotence layout as ledger_sink, carrying the sessionizer's
    # delta columns instead of the event partials
    def run(run_idx):
        stream = sessionize_transform(
            spark.readStream.schema(_SESS_SCHEMA).parquet(str(src))
        )

        def sink(batch_df, batch_id):
            (
                batch_df.withColumn(
                    "batch_id", SF.lit(batch_id).cast("long")
                )
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(out)
            )

        query = (
            stream.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", chk)
            .start()
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()

    _write_sess_batch(
        src,
        "b1.parquet",
        [(7, datetime(2026, 1, 1, 10, 0)), (7, datetime(2026, 1, 1, 10, 10))],
        0,
    )
    run(0)
    _write_sess_batch(
        src,
        "b2.parquet",
        [(7, datetime(2026, 1, 1, 10, 20)), (7, datetime(2026, 1, 1, 12, 0))],
        10,
    )
    run(1)
    back = spark.read.schema(
        "user_id long, d_sessions long, d_events long, batch_id bigint"
    ).parquet(out)
    totals = {
        r.user_id: (r.n_sessions, r.total_events)
        for r in back.groupBy("user_id")
        .agg(
            SF.sum("d_sessions").alias("n_sessions"),
            SF.sum("d_events").alias("total_events"),
        )
        .collect()
    }
    assert totals == {7: (2, 4)}


def _start_enrich_query(spark, src, dimdir, tmp_path):
    stream = spark.readStream.schema(
        T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        )
    ).parquet(str(src))
    dim = spark.read.parquet(str(dimdir))
    joined = stream.join(
        F.broadcast(dim), F.col("user_id") == F.col("c_custkey"), "inner"
    )
    return _start_memory_query(joined, tmp_path, "append")


def _write_dim_file(dimdir, key, seg):
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([key], pa.int64()),
                "c_mktsegment": pa.array([seg], pa.string()),
            }
        ),
        str(dimdir / f"{uuid.uuid4().hex[:6]}.parquet"),
    )


def _write_enrich_batch(src, name, uids):
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(uids, pa.int64()),
                "ts": pa.array(
                    [datetime(2026, 1, 1, 10, i) for i in range(len(uids))],
                    pa.timestamp("us"),
                ),
            }
        ),
        str(src / name),
    )


def test_stream_static_join_dim_snapshot_is_frozen_at_start(spark, tmp_path):
    """static_enrich's trap, measured: the static side's parquet file
    LISTING is resolved at plan time, so a dim file ADDED mid-stream is
    silently invisible — batch 2's user-2 event finds no dim row and is
    dropped by the inner join without any error. (The docstring used to
    claim updates were picked up per trigger; this pins the truth.)"""
    src = tmp_path / "src"
    src.mkdir()
    dimdir = tmp_path / "dim"
    dimdir.mkdir()
    _write_dim_file(dimdir, 1, "A")
    _write_enrich_batch(src, "b1.parquet", [1])
    name, query = _start_enrich_query(spark, src, dimdir, tmp_path)
    try:
        query.processAllAvailable()
        _write_dim_file(dimdir, 2, "B")  # new dim key, NEW file, old intact
        _write_enrich_batch(src, "b2.parquet", [1, 2])
        query.processAllAvailable()
    finally:
        query.stop()
    rows = sorted(
        (r.user_id, r.c_mktsegment) for r in spark.table(name).collect()
    )
    # user 1 enriched in both batches; user 2 silently dropped — the
    # frozen listing never saw the new file
    assert rows == [(1, "A"), (1, "A")]


def test_stream_static_join_fails_loudly_on_replaced_dim_files(spark, tmp_path):
    """The complement: REPLACING the dim files in place (delete + write,
    the naive "publish a new dim version" move) fails the stream loudly
    with FAILED_READ_FILE on the next trigger — the frozen listing still
    points at the deleted file. Loud is the acceptable polarity; the
    silent-staleness case above is the one that eats data."""
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = tmp_path / "src"
    src.mkdir()
    dimdir = tmp_path / "dim"
    dimdir.mkdir()
    _write_dim_file(dimdir, 1, "A")
    _write_enrich_batch(src, "b1.parquet", [1])
    name, query = _start_enrich_query(spark, src, dimdir, tmp_path)
    try:
        query.processAllAvailable()
        for f in dimdir.iterdir():
            os.remove(f)
        _write_dim_file(dimdir, 1, "B")
        _write_enrich_batch(src, "b2.parquet", [1])
        import pytest as _pytest

        with _pytest.raises(StreamingQueryException, match="FILE_NOT_EXIST|FAILED_READ_FILE"):
            query.processAllAvailable()
            query.awaitTermination(30)
    finally:
        query.stop()
