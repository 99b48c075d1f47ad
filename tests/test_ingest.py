"""Incremental-dedup ingest: cross-batch exact dedup against the
persistent fingerprint registry, with restart/replay safety."""

import glob
import os

from pyspark.sql import functions as F

from near_event_streams_spark.streaming import ingest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_static_incremental_dedup_across_calls(spark, tmp_path):
    """Batch 2 must drop docs whose (normalized) text batch 1 already
    accepted — including whitespace/case variants — and keep new ones."""
    reg = str(tmp_path / "registry")

    b1 = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon")])
    s1 = ingest.dedup_batch_against_registry(b1, reg)
    got1 = {r["doc_id"] for r in s1.collect()}
    assert got1 == {1, 2}
    ingest.register_fingerprints(s1, reg, batch_id=0)

    b2 = _docs(
        spark,
        [
            (10, "  ALPHA   beta GAMMA "),  # normalization dup of doc 1
            (11, "zeta eta"),               # new
            (12, "zeta eta"),               # within-batch dup of 11
        ],
    )
    s2 = ingest.dedup_batch_against_registry(b2, reg)
    got2 = {r["doc_id"] for r in s2.collect()}
    assert got2 == {11}, got2


def test_streaming_ingest_end_to_end_with_restart(spark, tmp_path):
    """availableNow run, stop, drop overlapping docs, run again from the
    same checkpoint: corpus holds each distinct text exactly once."""
    src = tmp_path / "src"
    src.mkdir()
    corpus = str(tmp_path / "corpus")
    reg = str(tmp_path / "registry")
    ck = str(tmp_path / "ck")

    schema = "doc_id long, text string"

    def run_once():
        stream = spark.readStream.schema(schema).json(str(src))
        q = ingest.start_incremental_dedup_ingest(stream, corpus, reg, ck)
        q.awaitTermination()

    _docs(
        spark, [(1, "one two three"), (2, "four five six"), (3, "one two three")]
    ).coalesce(1).write.mode("append").json(str(src))
    run_once()

    out1 = spark.read.parquet(corpus)
    texts1 = sorted(r["text"] for r in out1.collect())
    assert texts1 == ["four five six", "one two three"]

    # second drop overlaps the first (doc 4 dups doc 2's text)
    _docs(
        spark, [(4, "four five six"), (5, "seven eight")]
    ).coalesce(1).write.mode("append").json(str(src))
    run_once()

    out2 = spark.read.parquet(corpus)
    texts2 = sorted(r["text"] for r in out2.collect())
    assert texts2 == ["four five six", "one two three", "seven eight"]
    ids = {r["doc_id"] for r in out2.collect()}
    assert ids == {1, 2, 5}, ids
    # batch partitions exist for both runs
    parts = {os.path.basename(p) for p in glob.glob(f"{corpus}/batch_id=*")}
    assert len(parts) >= 2


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Simulate the at-least-once window (crash after the corpus write +
    registry commit, before the checkpoint records the batch): running
    the same foreachBatch body again must leave corpus AND registry
    unchanged."""
    corpus = str(tmp_path / "corpus")
    reg = str(tmp_path / "registry")
    batch = _docs(spark, [(1, "aa bb"), (2, "cc dd"), (3, "aa bb")])

    def body(b, bid):
        surv = ingest.dedup_batch_against_registry(b, reg)
        # mirror of the streaming sink's corpus write
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                surv.drop("fingerprint")
                .withColumn("batch_id", F.lit(bid))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(corpus)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        ingest.register_fingerprints(surv, reg, bid)

    body(batch, 0)
    first = sorted(
        tuple(r) for r in spark.read.parquet(corpus).drop("batch_id").collect()
    )
    body(batch, 0)  # replay
    second = sorted(
        tuple(r) for r in spark.read.parquet(corpus).drop("batch_id").collect()
    )
    assert first == second and len(first) == 2
    from near_event_streams_spark.streaming import upsert

    state = upsert.read_state(spark, reg)
    assert state.count() == 2
