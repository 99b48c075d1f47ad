"""Structured Streaming parity tests: file-source pipeline end-to-end,
rejected side stream, watermark aggregation, streaming dedup, checkpoint
restart (sync-from-interruption)."""

import json
import os
import shutil

from pyspark.sql import functions as F

from near_event_streams_spark.config import NesConfig
from near_event_streams_spark.sources.streamer import stream_messages_json
from near_event_streams_spark.streaming import job


def _stream_dirs(tmp_path, fixture_messages_path):
    src = tmp_path / "blocks"
    src.mkdir()
    shutil.copy(fixture_messages_path, src / "blocks.jsonl")
    return str(src), str(tmp_path / "out"), str(tmp_path / "ckpt")


def test_stream_to_parquet_end_to_end(spark, fixture_messages_path, tmp_path):
    src, out, ckpt = _stream_dirs(tmp_path, fixture_messages_path)
    msgs = stream_messages_json(spark, src)
    q = job.start_to_parquet(msgs, NesConfig(), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # 4 valid events x 2 topics
    assert got.count() == 8
    topics = {r["topic"] for r in got.select("topic").distinct().collect()}
    assert "near_events_all" in topics
    assert "near_events.nep171.nft_mint" in topics


def test_stream_restart_is_incremental(spark, fixture_messages_path, tmp_path):
    """Checkpoint restart = the reference's sync-from-interruption
    (configs.rs:101-117): a restarted query must not reprocess old files
    and must pick up new ones."""
    src, out, ckpt = _stream_dirs(tmp_path, fixture_messages_path)
    msgs = stream_messages_json(spark, src)
    job.start_to_parquet(msgs, NesConfig(), out, ckpt).awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    # add one new block file, restart from the same checkpoint
    extra = {
        "block": {"header": {"height": 200, "timestamp": 1}},
        "shards": [
            {
                "shard_id": 0,
                "receipt_execution_outcomes": [
                    {
                        "receipt": {"receipt_id": "rX", "receiver_id": "c.near"},
                        "execution_outcome": {
                            "outcome": {
                                "logs": [
                                    'EVENT_JSON:{"standard":"nep171",'
                                    '"version":"1.0.0","event":"nft_burn",'
                                    '"data":{"x":1}}'
                                ]
                            }
                        },
                    }
                ],
            }
        ],
    }
    with open(os.path.join(src, "more.jsonl"), "w") as f:
        f.write(json.dumps(extra) + "\n")
    msgs2 = stream_messages_json(spark, src)
    job.start_to_parquet(msgs2, NesConfig(), out, ckpt).awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == n1 + 2  # exactly the new event x 2 topics
    assert got.filter(F.col("topic") == "near_events.nep171.nft_burn").count() == 1


def test_rejected_side_stream(spark, fixture_messages_path, tmp_path):
    src, out, ckpt = _stream_dirs(tmp_path, fixture_messages_path)
    msgs = stream_messages_json(spark, src)
    q = job.start_rejected_sink(msgs, NesConfig(), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    reasons = sorted(r["reject_reason"] for r in got.collect())
    assert reasons == ["parse_error", "validation_error"]


def test_whitelist_applies_in_stream(spark, fixture_messages_path, tmp_path):
    src, out, ckpt = _stream_dirs(tmp_path, fixture_messages_path)
    msgs = stream_messages_json(spark, src)
    cfg = NesConfig(whitelist_contract_ids=["nft.contract-a.near"])
    job.start_to_parquet(msgs, cfg, out, ckpt).awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 4  # 2 events from contract-a x 2 topics
    assert {r["key"] for r in got.collect()} == {"nft.contract-a.near"}


def test_windowed_contract_counts_with_watermark(
    spark, fixture_messages_path, tmp_path
):
    src, _, ckpt = _stream_dirs(tmp_path, fixture_messages_path)
    msgs = stream_messages_json(spark, src)
    from near_event_streams_spark.operators.extract import extract_events

    collected = []

    def sink(batch, batch_id):
        collected.extend(batch.collect())

    def transform(stream_df):
        events, _ = extract_events(stream_df)
        return job.windowed_contract_counts(events)

    q = job.run_batches(msgs, transform, ckpt, sink)
    q.awaitTermination(120)
    counts = {
        (r["contract_account_id"], r["n_events"]) for r in collected
    }
    assert ("nft.contract-a.near", 2) in counts or (
        "nft.contract-a.near",
        1,
    ) in counts  # two blocks may fall in different windows
    assert any(c[0] == "app.other.near" for c in counts)


def test_streaming_dedup_receipts(spark, tmp_path):
    """Duplicate delivery of the same block collapses to one event."""
    block = {
        "block": {"header": {"height": 1, "timestamp": 1_700_000_000_000_000_000}},
        "shards": [
            {
                "shard_id": 0,
                "receipt_execution_outcomes": [
                    {
                        "receipt": {"receipt_id": "dup", "receiver_id": "c.near"},
                        "execution_outcome": {
                            "outcome": {
                                "logs": [
                                    'EVENT_JSON:{"standard":"nep171",'
                                    '"version":"1.0.0","event":"nft_mint",'
                                    '"data":[{"owner_id":"o","token_ids":["1"]}]}'
                                ]
                            }
                        },
                    }
                ],
            }
        ],
    }
    src = tmp_path / "dupblocks"
    src.mkdir()
    with open(src / "b.jsonl", "w") as f:
        f.write(json.dumps(block) + "\n")
        f.write(json.dumps(block) + "\n")  # redelivered

    from near_event_streams_spark.operators.extract import extract_events

    collected = []

    def sink(batch, batch_id):
        collected.extend(batch.collect())

    def transform(stream_df):
        events, _ = extract_events(stream_df)
        return job.dedup_receipts(events)

    msgs = stream_messages_json(spark, str(src))
    q = job.run_batches(msgs, transform, str(tmp_path / "ck2"), sink)
    q.awaitTermination(120)
    assert len(collected) == 1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark variant: same effectively-once
    collapse, but with guaranteed state eviction past the watermark."""
    block = {
        "block": {"header": {"height": 1, "timestamp": 1_700_000_000_000_000_000}},
        "shards": [
            {
                "shard_id": 0,
                "receipt_execution_outcomes": [
                    {
                        "receipt": {"receipt_id": "dup", "receiver_id": "c.near"},
                        "execution_outcome": {
                            "outcome": {
                                "logs": [
                                    'EVENT_JSON:{"standard":"nep171",'
                                    '"version":"1.0.0","event":"nft_mint",'
                                    '"data":[{"owner_id":"o","token_ids":["1"]}]}'
                                ]
                            }
                        },
                    }
                ],
            }
        ],
    }
    src = tmp_path / "wmblocks"
    src.mkdir()
    with open(src / "b.jsonl", "w") as f:
        f.write(json.dumps(block) + "\n")
        f.write(json.dumps(block) + "\n")  # redelivered

    from near_event_streams_spark.operators.extract import extract_events

    collected = []

    def sink(batch, batch_id):
        collected.extend(batch.collect())

    def transform(stream_df):
        events, _ = extract_events(stream_df)
        return job.dedup_receipts_within_watermark(events)

    msgs = stream_messages_json(spark, str(src))
    q = job.run_batches(msgs, transform, str(tmp_path / "ckwm"), sink)
    q.awaitTermination(120)
    assert len(collected) == 1


def test_observe_metrics_surface_in_listener(
    spark, fixture_messages_path, tmp_path
):
    """observe() aggregates ride the running plan and reach the listener
    as observedMetrics — no second pass over the batch data."""
    import time
    from pyspark.sql.streaming import StreamingQueryListener

    from near_event_streams_spark.operators.extract import extract_events

    class Captures(StreamingQueryListener):
        def __init__(self):
            self.metrics = []

        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            m = event.progress.observedMetrics.get("nes_metrics")
            if m is not None:
                self.metrics.append(m)

        def onQueryTerminated(self, event):  # noqa: N802
            pass

        def onQueryIdle(self, event):  # noqa: N802
            pass

    listener = Captures()
    spark.streams.addListener(listener)
    try:
        src = tmp_path / "blocks"
        src.mkdir()
        import shutil as _shutil

        _shutil.copy(fixture_messages_path, src / "blocks.jsonl")
        collected = []

        def transform(stream_df):
            events, _ = extract_events(stream_df)
            return job.with_batch_observability(events)

        q = job.run_batches(
            stream_messages_json(spark, str(src)),
            transform,
            str(tmp_path / "ckobs"),
            lambda b, i: collected.extend(b.collect()),
        )
        q.awaitTermination(120)
        for _ in range(40):
            if listener.metrics:
                break
            time.sleep(0.25)
        assert listener.metrics, "no observed metrics reached the listener"
        m = listener.metrics[0]
        assert m["n_events"] == 4  # 4 valid events in the fixture
        assert m["n_contracts"] >= 3
        assert m["max_height"] == 101
    finally:
        spark.streams.removeListener(listener)


def test_stats_listener_reports_throughput(
    spark, fixture_messages_path, tmp_path
):
    from near_event_streams_spark.streaming.stats import BlockStatsListener

    listener = BlockStatsListener(
        tip_provider=lambda: 1000,
        last_height_provider=lambda: 101,
        emit=lambda line: None,
    )
    spark.streams.addListener(listener)
    try:
        src, out, ckpt = _stream_dirs(tmp_path, fixture_messages_path)
        msgs = stream_messages_json(spark, src)
        q = job.start_to_parquet(msgs, NesConfig(), out, ckpt)
        q.awaitTermination(120)
        # listener events are async; wait briefly
        import time

        for _ in range(40):
            if listener.lines:
                break
            time.sleep(0.25)
        assert any("blocks in batch" in line for line in listener.lines)
    finally:
        spark.streams.removeListener(listener)


def test_idempotent_sink_replay_safe(spark, fixture_messages_path, tmp_path):
    """Replaying a micro-batch (the at-least-once failure mode) must not
    duplicate rows: the per-batch partition overwrite makes the sink
    idempotent — effectively exactly-once end to end."""
    import shutil as _shutil

    src = tmp_path / "blocks"
    src.mkdir()
    _shutil.copy(fixture_messages_path, src / "blocks.jsonl")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    msgs = stream_messages_json(spark, str(src))
    q = job.start_to_parquet_idempotent(msgs, NesConfig(), out, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out).count()
    assert first == 8  # 4 valid events x 2 topics

    # simulate redelivery: wipe the checkpoint so the SAME source file
    # replays as batch 0 again
    _shutil.rmtree(ckpt)
    q2 = job.start_to_parquet_idempotent(msgs, NesConfig(), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == first  # no duplicates


def test_inplace_compaction_preserves_rows_and_replay_safety(
    spark, fixture_messages_path, tmp_path
):
    """Three micro-batches → in-place compaction merges the two CLOSED
    batches into one size-targeted dir (open batch untouched), rows are
    byte-identical, and a full checkpoint-loss replay on the compacted
    layout still lands on the original row set (no duplicates)."""
    import os as _os
    import shutil as _shutil

    from near_event_streams_spark.sinks.parquet_sink import (
        compact_batch_dirs_inplace,
    )

    src = tmp_path / "blocks"
    src.mkdir()
    for i in range(3):
        dst = src / f"blocks{i}.jsonl"
        _shutil.copy(fixture_messages_path, dst)
        # deterministic batch order: file-source batches sort by mtime
        _os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        q = job.start_to_parquet_idempotent(
            stream_messages_json(spark, str(src), max_files_per_trigger=1),
            NesConfig(),
            out,
            ckpt,
        )
        q.awaitTermination(180)

    run()
    before = {tuple(r) for r in spark.read.parquet(out).drop("batch_id").collect()}
    dirs = sorted(d for d in _os.listdir(out) if d.startswith("batch_id="))
    assert dirs == ["batch_id=0", "batch_id=1", "batch_id=2"]

    n_batches, n_files = compact_batch_dirs_inplace(spark, out)
    assert (n_batches, n_files) == (2, 1)  # closed 0+1 merged, 2 left open
    dirs = sorted(d for d in _os.listdir(out) if d.startswith("batch_id="))
    assert dirs == ["batch_id=1", "batch_id=2"]
    assert not [d for d in _os.listdir(out) if d.startswith(".compact")]
    after = {tuple(r) for r in spark.read.parquet(out).drop("batch_id").collect()}
    assert after == before

    # replay-safety survives compaction: lose the checkpoint entirely,
    # replay all three batches over the compacted layout
    _shutil.rmtree(ckpt)
    run()
    replayed = {
        tuple(r) for r in spark.read.parquet(out).drop("batch_id").collect()
    }
    assert replayed == before


def test_compaction_crash_recovery(spark, fixture_messages_path, tmp_path):
    """Interrupted swaps repair themselves: tmp-present state restores the
    originals; trash-only state (swap done) drops the trash."""
    import os as _os
    import shutil as _shutil

    from near_event_streams_spark.sinks.parquet_sink import (
        compact_batch_dirs_inplace,
    )

    src = tmp_path / "blocks"
    src.mkdir()
    for i in range(3):
        dst = src / f"blocks{i}.jsonl"
        _shutil.copy(fixture_messages_path, dst)
        _os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = job.start_to_parquet_idempotent(
        stream_messages_json(spark, str(src), max_files_per_trigger=1),
        NesConfig(),
        out,
        ckpt,
    )
    q.awaitTermination(180)
    before = {tuple(r) for r in spark.read.parquet(out).drop("batch_id").collect()}

    # simulate a crash mid-swap: batch 0 moved to trash, tmp still present
    _os.rename(f"{out}/batch_id=0", f"{out}/.compact_trash.batch_id=0")
    _os.makedirs(f"{out}/.compact_tmp_1")
    n_batches, _ = compact_batch_dirs_inplace(spark, out)
    assert n_batches == 2  # recovery restored batch 0, then compaction ran
    after = {tuple(r) for r in spark.read.parquet(out).drop("batch_id").collect()}
    assert after == before


def test_compact_batches_roundtrip(spark, fixture_messages_path, tmp_path):
    """batch_id layout → compacted topic-partitioned table with identical
    rows and a prunable layout."""
    import os as _os

    from near_event_streams_spark.sinks.parquet_sink import compact_batches

    src = tmp_path / "blocks"
    src.mkdir()
    import shutil as _shutil

    _shutil.copy(fixture_messages_path, src / "blocks.jsonl")
    out, ckpt = str(tmp_path / "batches"), str(tmp_path / "ckpt")
    q = job.start_to_parquet_idempotent(
        stream_messages_json(spark, str(src)), NesConfig(), out, ckpt
    )
    q.awaitTermination(120)

    compacted = str(tmp_path / "compacted")
    n = compact_batches(spark, out, compacted, partition_by=["topic"])
    assert n == 8
    dirs = {d for d in _os.listdir(compacted) if d.startswith("topic=")}
    assert len(dirs) >= 2, dirs
    back = spark.read.parquet(compacted)
    assert back.count() == 8
    assert "batch_id" not in back.columns
