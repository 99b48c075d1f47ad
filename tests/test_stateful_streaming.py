"""Stateful streaming operators: sliding windows, session windows, and the
custom applyInPandasWithState sessionizer.

Each streaming test feeds JSONL files one per micro-batch
(``maxFilesPerTrigger=1``) so the watermark advances deterministically
between batches — append-mode windows only emit once the watermark passes
their end, and the stateful sessionizer's event-time timeout only fires
when the watermark passes last_event + gap.
"""

import json
import os
from datetime import datetime

from pyspark.sql import functions as F

from near_event_streams_spark.streaming import stateful

SCHEMA = "user_id string, event_type string, value double, event_ts timestamp"


def _write_batch(src_dir, name, rows):
    """Write one micro-batch file with an explicit mtime (file order =
    name order): Spark's file source processes files by modification
    time, and sub-ms writes would otherwise tie."""
    path = src_dir / name
    with open(path, "w") as f:
        for user, etype, value, ts in rows:
            f.write(
                json.dumps(
                    {
                        "user_id": user,
                        "event_type": etype,
                        "value": value,
                        "event_ts": ts,
                    }
                )
                + "\n"
            )
    seq = int(name.split(".")[0].lstrip("b"))
    os.utime(path, times=(1_700_000_000 + seq, 1_700_000_000 + seq))


def _run_stream(spark, src_dir, build, query_name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src_dir))
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {query_name}")


def test_sliding_windows_batch_semantics(spark):
    """2-min windows sliding by 1 min: an event belongs to 2 windows."""
    df = spark.createDataFrame(
        [("u1", "click", 1.0, datetime(2024, 1, 1, 0, 0, 30))], SCHEMA
    )
    out = stateful.sliding_event_counts(
        df, key_col="event_type", duration="2 minutes", slide="1 minute"
    )
    rows = sorted(
        (str(r["window_start"]), r["n_events"]) for r in out.collect()
    )
    assert rows == [
        ("2023-12-31 23:59:00", 1),
        ("2024-01-01 00:00:00", 1),
    ]


def test_session_window_batch_semantics(spark):
    """Events within the gap merge into one session; beyond it, two."""
    df = spark.createDataFrame(
        [
            ("u1", "click", 1.0, datetime(2024, 1, 1, 0, 0, 0)),
            ("u1", "click", 2.0, datetime(2024, 1, 1, 0, 10, 0)),
            ("u1", "click", 4.0, datetime(2024, 1, 1, 2, 0, 0)),
            ("u2", "view", 8.0, datetime(2024, 1, 1, 0, 5, 0)),
        ],
        SCHEMA,
    )
    out = stateful.session_window_stats(df, gap="30 minutes")
    got = {
        (r["key"], str(r["session_start"]), r["n_events"], r["session_value"])
        for r in out.collect()
    }
    assert got == {
        ("u1", "2024-01-01 00:00:00", 2, 3.0),
        ("u1", "2024-01-01 02:00:00", 1, 4.0),
        ("u2", "2024-01-01 00:05:00", 1, 8.0),
    }


def test_sliding_windows_streaming_append(spark, tmp_path):
    """Append-mode sliding windows finalize once the watermark passes."""
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        src,
        "b1.jsonl",
        [
            ("u1", "click", 1.0, "2024-01-01 00:00:10"),
            ("u1", "click", 1.0, "2024-01-01 00:01:10"),
        ],
    )
    # far-future event advances the watermark, closing the early windows
    _write_batch(src, "b2.jsonl", [("u1", "view", 1.0, "2024-01-01 03:00:00")])
    out = _run_stream(
        spark,
        src,
        lambda s: stateful.sliding_event_counts(
            s, duration="2 minutes", slide="1 minute", watermark="0 seconds"
        ),
        "sliding_out",
    )
    got = {
        (str(r["window_start"]), r["key"], r["n_events"])
        for r in out.collect()
    }
    # click windows: 23:59+00:00 (1 event each... ) — event@00:00:10 in
    # [23:59,00:01) and [00:00,00:02); event@00:01:10 in [00:00,00:02) and
    # [00:01,00:03). All closed by the 03:00 watermark.
    assert ("2023-12-31 23:59:00", "click", 1) in got
    assert ("2024-01-01 00:00:00", "click", 2) in got
    assert ("2024-01-01 00:01:00", "click", 1) in got


def test_stateful_sessionizer_gap_close_and_timeout(spark, tmp_path):
    """Custom applyInPandasWithState sessionizer: session 1 closes when a
    later event for the same key arrives past the gap; session 2 closes
    via event-time TIMEOUT when the watermark (driven by another key)
    passes its gap with no new events."""
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        src,
        "b1.jsonl",
        [
            ("u1", "click", 1.0, "2024-01-01 00:00:00"),
            ("u1", "click", 2.0, "2024-01-01 00:00:30"),
        ],
    )
    # same key, past the 60s gap -> closes session 1 on arrival
    _write_batch(src, "b2.jsonl", [("u1", "click", 4.0, "2024-01-01 02:00:00")])
    # other key far ahead -> watermark passes session 2's timeout
    _write_batch(src, "b3.jsonl", [("u2", "view", 8.0, "2024-01-01 05:00:00")])
    _write_batch(src, "b4.jsonl", [("u2", "view", 16.0, "2024-01-01 05:00:10")])
    out = _run_stream(
        spark,
        src,
        lambda s: stateful.sessionize_stateful(
            s, gap_seconds=60, watermark="0 seconds"
        ),
        "sessions_out",
    )
    u1 = {
        (str(r["session_start"]), r["n_events"], r["session_value"])
        for r in out.filter("key = 'u1'").collect()
    }
    assert ("2024-01-01 00:00:00", 2, 3.0) in u1, u1
    assert ("2024-01-01 02:00:00", 1, 4.0) in u1, u1


def test_sessionizer_rocksdb_state_store_restart(spark, tmp_path):
    """The applyInPandasWithState sessionizer on the RocksDB state-store
    provider (the cluster deployment claim in ``stateful.py`` — bounded
    executor memory, changelog checkpointing), including the property
    that makes the provider worth testing: keyed state written by run 1
    must survive a query RESTART from the checkpoint and close via
    timeout in run 2. The expected sessions are the same ones the
    default in-memory provider produces (pinned by
    ``test_stateful_sessionizer_gap_close_and_timeout``). Env-skips
    only if the bundled RocksDB JNI cannot load in this container."""
    import pytest

    provider = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        src,
        "b1.jsonl",
        [
            ("u1", "click", 1.0, "2024-01-01 00:00:00"),
            ("u1", "click", 2.0, "2024-01-01 00:00:30"),
        ],
    )
    # past the 60s gap -> closes session 1 on arrival, opens session 2
    _write_batch(src, "b2.jsonl", [("u1", "click", 4.0, "2024-01-01 02:00:00")])

    out_dir = str(tmp_path / "out")

    def start_query():
        # parquet sink, not memory: the memory sink refuses checkpoint
        # recovery, and surviving a restart is the point of this test
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        return (
            stateful.sessionize_stateful(
                stream, gap_seconds=60, watermark="0 seconds"
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    def read_sessions():
        return {
            (r["key"], str(r["session_start"]), r["n_events"],
             r["session_value"])
            for r in spark.read.parquet(out_dir).collect()
        }

    try:
        old = spark.conf.get(conf_key)
    except Exception:
        old = None
    spark.conf.set(conf_key, provider)
    try:
        try:
            q1 = start_query()
            q1.awaitTermination(120)
        except Exception as exc:  # pragma: no cover — env-dependent
            if "RocksDB" in str(exc) or "UnsatisfiedLink" in str(exc):
                pytest.skip(f"RocksDB JNI unavailable: {exc}")
            raise
        run1 = read_sessions()
        # session 1 closed by the past-gap arrival; session 2 still OPEN
        # in RocksDB state when run 1 drains
        assert ("u1", "2024-01-01 00:00:00", 2, 3.0) in run1, run1
        assert not any(s[1] == "2024-01-01 02:00:00" for s in run1), run1

        # run 2: fresh files advance the watermark; the restarted query
        # must recover u1's open session FROM THE CHECKPOINTED RocksDB
        # state and close it via event-time timeout
        _write_batch(src, "b3.jsonl", [("u2", "view", 8.0, "2024-01-01 05:00:00")])
        _write_batch(src, "b4.jsonl", [("u2", "view", 16.0, "2024-01-01 05:00:10")])
        q2 = start_query()
        q2.awaitTermination(120)
        run2 = read_sessions()
        assert ("u1", "2024-01-01 02:00:00", 1, 4.0) in run2, run2
    finally:
        if old is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, old)


def test_stream_stream_join_attribution(spark, tmp_path):
    """Purchases join clicks from the same user within 30 min; an older
    click outside the window must NOT match."""
    src = tmp_path / "ss"
    src.mkdir()
    _write_batch(
        src,
        "b1.jsonl",
        [
            ("u1", "click", 0.0, "2024-01-01 00:00:00"),   # in-window click
            ("u1", "click", 0.0, "2024-01-01 10:00:00"),   # far-future click
        ],
    )
    _write_batch(
        src,
        "b2.jsonl",
        [
            ("u1", "purchase", 9.0, "2024-01-01 00:10:00"),  # 10 min later
            ("u2", "purchase", 5.0, "2024-01-01 00:20:00"),  # no clicks
        ],
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    clicks = stream.filter("event_type = 'click'").withColumn(
        "event_id", (F.unix_micros("event_ts") % 1000000).cast("long")
    )
    purchases = stream.filter("event_type = 'purchase'").withColumn(
        "event_id", (F.unix_micros("event_ts") % 1000000).cast("long")
    )
    q = (
        stateful.attribute_purchases_to_clicks(clicks, purchases)
        .writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM attributed").collect()
    got = {
        (r["user_id"], str(r["purchase_ts"]), str(r["click_ts"]))
        for r in rows
    }
    # exactly one match: u1's purchase to its in-window click; the
    # 10:00:00 click is AFTER the purchase, u2 has no clicks
    assert got == {
        ("u1", "2024-01-01 00:10:00", "2024-01-01 00:00:00")
    }, got


def test_transform_with_state_running_totals(spark, tmp_path):
    """Spark-4 transformWithStateInPandas: totals accumulate across
    micro-batches; each batch emits the touched key's new cumulative.

    The TWS runtime speaks protobuf to the JVM state server; this
    container ships a broken google.protobuf, so the test skips where
    the API can't initialize (the operator itself is import-clean)."""
    import pytest
    pytest.importorskip("google.protobuf.descriptor")
    src = tmp_path / "tws"
    src.mkdir()
    _write_batch(
        src,
        "b1.jsonl",
        [
            ("u1", "click", 1.0, "2024-01-01 00:00:00"),
            ("u1", "click", 2.0, "2024-01-01 00:01:00"),
            ("u2", "view", 10.0, "2024-01-01 00:02:00"),
        ],
    )
    _write_batch(src, "b2.jsonl", [("u1", "click", 4.0, "2024-01-01 01:00:00")])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stateful.running_totals_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM tws_out").collect()
    # last emission per key carries the cumulative totals
    final = {}
    for r in rows:
        final[r["key"]] = (r["n_events"], r["total_value"])
    assert final["u1"] == (3, 7.0), final
    assert final["u2"] == (1, 10.0), final


def test_transform_with_state_session_timeout(spark, tmp_path):
    """Timer-driven session timeout (session_timeout_tws): a key idle
    for a full gap has its session EMITTED BY THE TIMER on a later
    micro-batch — no follow-up event needed — and the state cleared.

    Env-skip: same protobuf-backed TWS worker as running_totals_tws."""
    import time as _time

    import pytest
    pytest.importorskip("google.protobuf.descriptor")
    src = tmp_path / "tws_sess"
    src.mkdir()
    _write_batch(
        src,
        "b1.jsonl",
        [
            ("u1", "click", 1.0, "2024-01-01 00:00:00"),
            ("u1", "click", 2.0, "2024-01-01 00:01:00"),
        ],
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stateful.session_timeout_tws(stream, gap="1 millisecond")
        .writeStream.format("memory")
        .queryName("tws_sess_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # a second batch (new file) gives the expired timer a batch to
        # fire in; the gap (1 ms) has long elapsed by then
        _time.sleep(1.5)
        _write_batch(
            src, "b2.jsonl", [("u2", "view", 9.0, "2024-01-01 02:00:00")]
        )
        deadline = _time.time() + 60
        rows = []
        while _time.time() < deadline:
            rows = spark.sql("SELECT * FROM tws_sess_out").collect()
            if rows:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    got = {(r["key"], r["n_events"], r["total_value"]) for r in rows}
    assert ("u1", 2, 3.0) in got, got


def test_session_timeout_gap_validation(spark):
    """The gap parser must reject malformed strings with a clear
    ValueError (not a bare KeyError/IndexError) and accept 'day' —
    validated BEFORE the protobuf-backed worker import, so this runs
    in every environment."""
    import pytest

    df = spark.createDataFrame(
        [("u1", 1.0)], "user_id string, value double"
    )
    # '² seconds': Unicode superscript passes str.isdigit() but not
    # int(); '0 seconds': zero-length gap — both must hit the friendly
    # ValueError, not a raw int() failure or a silently-armed 0ms timer
    for bad in ("10min", "2 fortnights", "soon", "1.5 hours", "",
                "² seconds", "0 seconds"):
        with pytest.raises(ValueError, match="session_timeout_tws"):
            stateful.session_timeout_tws(df, gap=bad)
    # 'day'/'days' and plural forms parse (plan construction may still
    # env-skip later — the parse itself must not raise)
    try:
        stateful.session_timeout_tws(df, gap="2 days")
    except ValueError as e:  # pragma: no cover
        raise AssertionError(f"'2 days' should parse: {e}") from e
    except Exception:
        # non-streaming input / missing protobuf raise other errors
        # downstream of the parse — not this test's concern
        pass


def test_sessionizer_late_member_extends_session_start(spark, tmp_path):
    """r14 review: a late-but-within-gap event arriving BEFORE the open
    session's start (across micro-batches, inside the watermark) was
    counted into the session but the reported start stayed frozen at
    the first-SEEN event — a member outside its own session's span.
    The span must be the hull of member events (min start, max end),
    matching session_timeout_tws and F.session_window merges."""
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src, "b1.jsonl", [("u1", "click", 1.0, "2024-01-01 01:00:00")])
    # late arrival 20s EARLIER, within the 60s gap and the 2h watermark
    _write_batch(src, "b2.jsonl", [("u1", "click", 2.0, "2024-01-01 00:59:40")])
    # other key far ahead: watermark (5:00 - 2h = 3:00) passes the
    # session's last+gap -> event-time timeout flushes u1
    _write_batch(src, "b3.jsonl", [("u2", "view", 8.0, "2024-01-01 05:00:00")])
    _write_batch(src, "b4.jsonl", [("u2", "view", 16.0, "2024-01-01 05:30:00")])
    out = _run_stream(
        spark,
        src,
        lambda s: stateful.sessionize_stateful(
            s, gap_seconds=60, watermark="2 hours"
        ),
        "sessions_late_member",
    )
    u1 = {
        (
            str(r["session_start"]),
            str(r["session_end"]),
            r["n_events"],
            r["session_value"],
        )
        for r in out.filter("key = 'u1'").collect()
    }
    assert (
        "2024-01-01 00:59:40",
        "2024-01-01 01:00:00",
        2,
        3.0,
    ) in u1, u1


def test_sessionizer_straggler_beyond_gap_is_own_session(spark, tmp_path):
    """r14 advisory: the merge branch fired for ANY ts < last_us, so a
    late event arriving MORE than gap before the open session's start
    (but inside the watermark) was absorbed — the reported span then
    contained an internal silence longer than the gap, where
    F.session_window would emit that event as its own session. The
    sweep now merges only genuinely-within-gap neighbors, and
    mutually-adjacent stragglers coalesce with each other."""
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src, "b1.jsonl", [("u1", "click", 1.0, "2024-01-01 01:00:00")])
    # two stragglers ~25 min before the open session: far beyond the
    # 60s gap (must NOT merge with it), 10s apart from each other
    # (MUST coalesce into one 2-event session)
    _write_batch(
        src,
        "b2.jsonl",
        [
            ("u1", "click", 2.0, "2024-01-01 00:35:00"),
            ("u1", "click", 4.0, "2024-01-01 00:35:10"),
        ],
    )
    # u2 far ahead: watermark (5:00 - 2h = 3:00) flushes u1's open
    # session via the event-time timeout
    _write_batch(src, "b3.jsonl", [("u2", "view", 8.0, "2024-01-01 05:00:00")])
    _write_batch(src, "b4.jsonl", [("u2", "view", 16.0, "2024-01-01 05:30:00")])
    out = _run_stream(
        spark,
        src,
        lambda s: stateful.sessionize_stateful(
            s, gap_seconds=60, watermark="2 hours"
        ),
        "sessions_straggler",
    )
    u1 = {
        (
            str(r["session_start"]),
            str(r["session_end"]),
            r["n_events"],
            r["session_value"],
        )
        for r in out.filter("key = 'u1'").collect()
    }
    assert u1 == {
        # the straggler pair: one closed 2-event session, gap-separated
        ("2024-01-01 00:35:00", "2024-01-01 00:35:10", 2, 6.0),
        # the original event: untouched span, flushed by the timeout
        ("2024-01-01 01:00:00", "2024-01-01 01:00:00", 1, 1.0),
    }, u1


def test_sessionizer_straggler_merges_into_pending_closed_span(
    spark, tmp_path
):
    """r15 advice: gap-separated spans used to be EMITTED the moment a
    batch sweep separated them — before the watermark passed their
    end+gap — so a later within-watermark straggler within gap of one
    emitted as a second fragment where F.session_window would merge.
    Spans now ride in state until the watermark finalizes them: the
    00:35:00 straggler span (gap-separated from the open 01:00:00
    session in batch 2) absorbs batch 3's 00:35:30 straggler into ONE
    session instead of two fragments."""
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src, "b1.jsonl", [("u1", "click", 1.0, "2024-01-01 01:00:00")])
    # straggler far before the open session: beyond the 60s gap
    # (separate span) but NOT yet watermark-finalized
    _write_batch(src, "b2.jsonl", [("u1", "click", 2.0, "2024-01-01 00:35:00")])
    # second straggler within gap of the FIRST straggler's span — the
    # old sessionizer had already emitted that span and fragmented here
    _write_batch(src, "b3.jsonl", [("u1", "click", 4.0, "2024-01-01 00:35:30")])
    # u2 far ahead: watermark (5:30 - 2h = 3:30) finalizes everything
    _write_batch(src, "b4.jsonl", [("u2", "view", 8.0, "2024-01-01 05:00:00")])
    _write_batch(src, "b5.jsonl", [("u2", "view", 16.0, "2024-01-01 05:30:00")])
    out = _run_stream(
        spark,
        src,
        lambda s: stateful.sessionize_stateful(
            s, gap_seconds=60, watermark="2 hours"
        ),
        "sessions_pending_merge",
    )
    u1 = {
        (
            str(r["session_start"]),
            str(r["session_end"]),
            r["n_events"],
            r["session_value"],
        )
        for r in out.filter("key = 'u1'").collect()
    }
    assert u1 == {
        # ONE merged straggler session — not two fragments
        ("2024-01-01 00:35:00", "2024-01-01 00:35:30", 2, 6.0),
        ("2024-01-01 01:00:00", "2024-01-01 01:00:00", 1, 1.0),
    }, u1


def test_sessionizer_exactly_gap_spacing_merges_like_native(spark, tmp_path):
    """r16 advice: settle() finalized once end+gap <= watermark while
    the sweep merged at ts - end <= gap (inclusive), so a pair of
    events spaced exactly gap apart merged or fragmented depending on
    whether the watermark happened to reach exactly end+gap between
    their batches. The CONTRACT is the native one — F.session_window
    merges exactly-gap-spaced events (verified below: one native
    session), i.e. the inclusive merge is correct — so the fix is
    STRICT finalization (end+gap < wm): an interval is held while an
    event at exactly end+gap is still acceptable. Exactly-gap spacing
    is now ALWAYS one merged session, same-batch or cross-batch."""
    src = tmp_path / "src"
    src.mkdir()
    # u1: both boundary events in ONE batch (same sweep)
    _write_batch(
        src,
        "b1.jsonl",
        [
            ("u1", "click", 1.0, "2024-01-01 01:00:00"),
            ("u1", "click", 2.0, "2024-01-01 01:01:00"),  # exactly 60s
        ],
    )
    # u2: the same exact-gap spacing split ACROSS batches — the
    # timing-dependent case from the advice
    _write_batch(src, "b2.jsonl", [("u2", "click", 4.0, "2024-01-01 01:00:00")])
    _write_batch(src, "b3.jsonl", [("u2", "click", 8.0, "2024-01-01 01:01:00")])
    # u3 far ahead: watermark (5:30 - 2h = 3:30) finalizes everything
    _write_batch(src, "b4.jsonl", [("u3", "view", 16.0, "2024-01-01 05:00:00")])
    _write_batch(src, "b5.jsonl", [("u3", "view", 32.0, "2024-01-01 05:30:00")])
    out = _run_stream(
        spark,
        src,
        lambda s: stateful.sessionize_stateful(
            s, gap_seconds=60, watermark="2 hours"
        ),
        "sessions_exact_gap",
    )
    got = {
        key: {
            (
                str(r["session_start"]),
                str(r["session_end"]),
                r["n_events"],
                r["session_value"],
            )
            for r in out.filter(f"key = '{key}'").collect()
        }
        for key in ("u1", "u2")
    }
    assert got["u1"] == {
        ("2024-01-01 01:00:00", "2024-01-01 01:01:00", 2, 3.0),
    }, got
    assert got["u2"] == {
        ("2024-01-01 01:00:00", "2024-01-01 01:01:00", 2, 12.0),
    }, got
    # the native F.session_window on the same data agrees: ONE merged
    # session — exactly-gap-spaced events DO merge (inclusive), which
    # is why the stateful sweep stays inclusive and the finalization
    # went strict rather than the other way around
    native = stateful.session_window_stats(
        spark.createDataFrame(
            [
                ("u1", "click", 1.0, datetime(2024, 1, 1, 1, 0, 0)),
                ("u1", "click", 2.0, datetime(2024, 1, 1, 1, 1, 0)),
            ],
            SCHEMA,
        ),
        gap="1 minute",
    )
    assert native.count() == 1
