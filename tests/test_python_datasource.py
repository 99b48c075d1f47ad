"""near_blocks Python Data Source: batch parity with the native JSON
reader, per-file partitioning, and streaming frontier semantics."""

import shutil

from pyspark.sql import functions as F

from near_event_streams_spark.operators.extract import extract_events
from near_event_streams_spark.sources import python_datasource as pds
from near_event_streams_spark.sources.streamer import read_messages_json


def test_batch_read_matches_native_json_source(
    spark, fixture_messages_path, tmp_path
):
    src = tmp_path / "blocks"
    src.mkdir()
    shutil.copy(fixture_messages_path, src / "blocks.jsonl")

    via_ds = pds.read_blocks(spark, str(src))
    native = read_messages_json(spark, str(src))
    assert via_ds.schema == native.schema
    ok_ds, _ = extract_events(via_ds)
    ok_native, _ = extract_events(native)
    rows_ds = {r["receipt_id"] for r in ok_ds.select("receipt_id").collect()}
    rows_native = {
        r["receipt_id"] for r in ok_native.select("receipt_id").collect()
    }
    assert rows_ds == rows_native and rows_ds


def test_batch_partitions_one_per_file(spark, fixture_messages_path, tmp_path):
    src = tmp_path / "blocks"
    src.mkdir()
    for i in range(3):
        shutil.copy(fixture_messages_path, src / f"b{i}.jsonl")
    pds.register(spark)
    raw = spark.read.format("near_blocks").option("path", str(src)).load()
    assert raw.select("path").distinct().count() == 3
    assert raw.rdd.getNumPartitions() == 3


def test_stream_reads_files_past_frontier(
    spark, fixture_messages_path, tmp_path
):
    import os

    src = tmp_path / "drop"
    src.mkdir()
    f0 = src / "b0.jsonl"
    shutil.copy(fixture_messages_path, f0)
    os.utime(f0, (1_700_000_000, 1_700_000_000))

    collected = []
    q = (
        pds.stream_blocks(spark, str(src))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(lambda b, i: collected.extend(b.collect()))
        .start()
    )
    try:
        q.processAllAvailable()
        n_first = len(collected)
        assert n_first > 0
        # a new file arrives beyond the frontier -> exactly one more batch
        f1 = src / "b1.jsonl"
        shutil.copy(fixture_messages_path, f1)
        os.utime(f1, (1_700_000_100, 1_700_000_100))
        q.processAllAvailable()
        assert len(collected) == 2 * n_first
    finally:
        q.stop()


def test_stream_offsets_replay_deterministically(
    spark, fixture_messages_path, tmp_path
):
    """readBetweenOffsets must reproduce a committed range exactly."""
    import os

    src = tmp_path / "drop"
    src.mkdir()
    for i in range(2):
        f = src / f"b{i}.jsonl"
        shutil.copy(fixture_messages_path, f)
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))

    reader = pds._StreamReader({"path": str(src)})
    start = reader.initialOffset()
    rows, end = reader.read(start)
    live = list(rows)
    replayed = list(reader.readBetweenOffsets(start, end))
    assert live == replayed and len(live) > 0
    # nothing beyond the new frontier
    rows2, end2 = reader.read(end)
    assert list(rows2) == [] and end2 == end


def test_writer_roundtrip_two_phase_commit(
    spark, fixture_messages_path, tmp_path
):
    """read → write via the custom writer → read back: identical events;
    no .tmp- leftovers (commit renamed every task file into place)."""
    import os

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(fixture_messages_path, src / "blocks.jsonl")
    msgs = read_messages_json(spark, str(src))
    out = tmp_path / "out"
    pds.write_blocks(msgs, str(out))

    names = sorted(os.listdir(out))
    assert names and all(n.startswith("part-") for n in names), names
    assert not [n for n in names if n.startswith(".tmp-")]

    back = pds.read_blocks(spark, str(out))
    ok_in, _ = extract_events(msgs)
    ok_out, _ = extract_events(back)
    assert {r["receipt_id"] for r in ok_out.select("receipt_id").collect()} == {
        r["receipt_id"] for r in ok_in.select("receipt_id").collect()
    }


def test_stream_writer_tags_batch_id(spark, fixture_messages_path, tmp_path):
    """Streaming writeStream through the custom sink: per-batch files are
    epoch-tagged and the payload round-trips."""
    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(fixture_messages_path, src / "blocks.jsonl")
    out = tmp_path / "out"

    pds.register(spark)
    q = (
        pds.stream_blocks(spark, str(src))
        .select(F.to_json(F.struct("*")).alias("block_json"))
        .writeStream.format("near_blocks")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import os

    names = [n for n in os.listdir(out) if n.endswith(".jsonl")]
    assert names and all("-b0" in n for n in names), names
    ok, _ = extract_events(pds.read_blocks(spark, str(out)))
    assert ok.count() == 4


def test_pushdown_projection_reaches_python_source(spark, tmp_path):
    """The from_json wrapper keeps parsing JVM-side: the Python plan node
    only ever carries the 4 raw columns."""
    src = tmp_path / "empty"
    src.mkdir()
    pds.register(spark)
    raw = spark.read.format("near_blocks").option("path", str(src)).load()
    assert [f.name for f in raw.schema.fields] == [
        "path",
        "mtime",
        "line_no",
        "block_json",
    ]
    parsed = pds.parse_raw_blocks(raw)
    assert parsed.count() == 0


def test_stream_reader_ingests_late_mtime_file(tmp_path, fixture_messages_path):
    """A file landing with mtime <= the committed frontier (mtime-
    preserving copy, clock skew) must still be ingested: the offset's
    seen-set, not the bare frontier, decides membership."""
    import os

    src = tmp_path / "drop"
    src.mkdir()
    f0 = src / "b_newer.jsonl"
    shutil.copy(fixture_messages_path, f0)
    os.utime(f0, ns=(1_700_000_100 * 10**9, 1_700_000_100 * 10**9))

    reader = pds._StreamReader({"path": str(src)})
    rows, off1 = reader.read(reader.initialOffset())
    n0 = len(list(rows))
    assert n0 > 0

    # late arrival: OLDER mtime than the frontier, name sorts earlier
    f1 = src / "a_older.jsonl"
    shutil.copy(fixture_messages_path, f1)
    os.utime(f1, ns=(1_700_000_050 * 10**9, 1_700_000_050 * 10**9))
    rows, off2 = reader.read(off1)
    got = list(rows)
    assert len(got) == n0, "late-mtime file was silently skipped"
    assert all(r[0].endswith("a_older.jsonl") for r in got)
    # the replay of that committed range returns exactly the late file
    replay = list(reader.readBetweenOffsets(off1, off2))
    assert replay == got
    # and it is never double-ingested
    rows, off3 = reader.read(off2)
    assert list(rows) == [] and off3 == off2


def test_stream_reader_prunes_seen_beyond_lag(tmp_path, fixture_messages_path):
    """The seen-set must stay bounded: entries older than the lag window
    fall out of the offset once the frontier advances past them."""
    import os

    src = tmp_path / "drop"
    src.mkdir()
    reader = pds._StreamReader({"path": str(src), "maxfilelagns": str(10**9)})

    f0 = src / "b0.jsonl"
    shutil.copy(fixture_messages_path, f0)
    os.utime(f0, ns=(1_700_000_000 * 10**9, 1_700_000_000 * 10**9))
    _, off1 = reader.read(reader.initialOffset())
    assert "b0.jsonl" in off1["seen"]

    # a file 100s later; b0 is far outside the 1s lag window
    f1 = src / "b1.jsonl"
    shutil.copy(fixture_messages_path, f1)
    os.utime(f1, ns=(1_700_000_100 * 10**9, 1_700_000_100 * 10**9))
    _, off2 = reader.read(off1)
    assert "b1.jsonl" in off2["seen"]
    # pruning uses the START frontier's window, so b0 leaves on the NEXT
    # advance; it must never be re-ingested either way
    f2 = src / "b2.jsonl"
    shutil.copy(fixture_messages_path, f2)
    os.utime(f2, ns=(1_700_000_200 * 10**9, 1_700_000_200 * 10**9))
    rows, off3 = reader.read(off2)
    assert all(r[0].endswith("b2.jsonl") for r in rows)
    assert "b0.jsonl" not in off3["seen"]


def test_stream_writer_replayed_batch_overwrites_itself(tmp_path):
    """At-least-once replay (crash after commit, before the checkpoint
    records the batch): re-running the same batchId must OVERWRITE the
    batch's files, not add a duplicate uuid-named copy."""
    import os
    from types import SimpleNamespace

    out = tmp_path / "out"
    writer = pds._BlocksStreamWriter({"path": str(out)})
    rows = [SimpleNamespace(block_json='{"n": %d}' % i) for i in range(3)]

    msg = writer.write(iter(rows))
    writer.commit([msg], batchId=7)
    first = sorted(os.listdir(out))
    assert first == ["part-00000-b7.jsonl"]

    # replay of batch 7 delivers the same rows again
    msg = writer.write(iter(rows))
    writer.commit([msg], batchId=7)
    assert sorted(os.listdir(out)) == first, "replay duplicated files"
    content = (out / first[0]).read_text().strip().splitlines()
    assert content == ['{"n": %d}' % i for i in range(3)]


def test_stream_writer_restart_no_loss_no_dup(
    spark, fixture_messages_path, tmp_path
):
    """Kill-and-restart e2e across the custom source AND sink: stop the
    query after the first batch, drop more files, restart from the same
    checkpoint — every input block appears in the output exactly once
    (frontier + deterministic epoch-keyed files make restart exact)."""
    import os

    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    ck = str(tmp_path / "ck")

    f0 = src / "b0.jsonl"
    shutil.copy(fixture_messages_path, f0)
    os.utime(f0, (1_700_000_000, 1_700_000_000))

    def run_once():
        q = (
            pds.stream_blocks(spark, str(src))
            .select(F.to_json(F.struct("*")).alias("block_json"))
            .writeStream.format("near_blocks")
            .option("path", str(out))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # batch 0, then the query terminates (simulated kill)
    first_files = sorted(n for n in os.listdir(out) if n.endswith(".jsonl"))
    assert first_files and all("-b0" in n for n in first_files)

    # two more files land while the job is down
    for i, ts in ((1, 1_700_000_100), (2, 1_700_000_200)):
        f = src / f"b{i}.jsonl"
        shutil.copy(fixture_messages_path, f)
        os.utime(f, (ts, ts))

    run_once()  # restart from the same checkpoint

    blocks_in = pds.read_blocks(spark, str(src))
    blocks_out = pds.read_blocks(spark, str(out))
    ok_in, _ = extract_events(blocks_in)
    ok_out, _ = extract_events(blocks_out)
    n_in, n_out = ok_in.count(), ok_out.count()
    assert n_out == n_in, f"lost or duplicated blocks: in={n_in} out={n_out}"
    # restart wrote NEW epoch files and left batch 0's untouched
    after = sorted(n for n in os.listdir(out) if n.endswith(".jsonl"))
    assert set(first_files) <= set(after) and len(after) > len(first_files)
