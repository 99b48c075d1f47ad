"""Incremental corpus ingestion: streaming exact-dedup against a
persistent fingerprint registry.

The batch dedup operators (``operators/dedup.py``) answer "which of
THESE docs duplicate each other"; a 24/7 ingest pipeline needs the
incremental question — "which of these NEW docs duplicate anything we
already accepted, across all previous batches". This module composes the
pieces the repo already has into that pipeline:

* fingerprint = md5 of whitespace-normalized lowercase text (the same
  normalization as ``dedup.normalized_text`` — deterministic,
  engine-portable, 16 bytes/doc regardless of doc size);
* the registry of accepted fingerprints lives in the bucket-pruned
  merge-upsert store (``streaming/upsert.py``) — reads prune to the
  buckets a batch touches, commits are crash/replay-safe;
* per micro-batch (``foreachBatch``): dedup WITHIN the batch (keep min
  doc_id per fingerprint), anti-join the registry, append only the
  survivors to the corpus sink, then register their fingerprints.

Replay safety: ``foreachBatch`` is at-least-once, and both crash
windows are covered. Crash BEFORE the registry commit → the replay
recomputes the same survivors (within-batch winner deterministic,
registry unchanged) and the ``batch_id=N`` dynamic partition overwrite
rewrites the identical files. Crash AFTER the registry commit → the
replay's survivors come back empty (their fingerprints are already
registered), the empty write touches no partition, and the idempotent
registry upsert is a no-op. Either way: no lost and no duplicated docs
(pytest-simulated in ``tests/test_ingest.py``).

Scale: the only per-batch costs are one hash aggregation over the batch
(small), one anti-join against the PRUNED registry buckets (state read
is O(dirty buckets), never O(corpus)), and one bounded upsert commit.
The corpus itself is never re-read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from near_event_streams_spark.operators.dedup import normalized_text
from near_event_streams_spark.streaming import upsert


def fingerprint_col(text_col: str = "text"):
    """md5 of the normalized text — the cross-batch dedup key."""
    return F.md5(normalized_text(F.col(text_col)))


def dedup_batch_against_registry(
    batch: DataFrame,
    registry_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One incremental-dedup step (static form, unit-testable without a
    stream): returns the batch rows that survive both within-batch and
    against-registry exact dedup, with their ``fingerprint`` attached.
    Does NOT update the registry — callers commit survivors explicitly
    so the read-decide-commit order is theirs to control."""
    spark = batch.sparkSession
    fp = batch.withColumn("fingerprint", fingerprint_col(text_col))
    keep = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    within = fp.join(keep, ["fingerprint", id_col], "left_semi")
    state = upsert.read_state(spark, registry_path)
    if state is None:
        return within
    return within.join(
        state.select("fingerprint"), "fingerprint", "left_anti"
    )


def register_fingerprints(
    survivors: DataFrame,
    registry_path: str,
    batch_id: int,
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> int:
    """Record accepted fingerprints in the registry (idempotent under
    replay: same keys, same seq, same winner)."""
    return upsert.merge_upsert(
        survivors.select(
            "fingerprint",
            F.col(id_col).alias("first_doc_id"),
            F.lit(batch_id).cast("long").alias("seq"),
        ),
        registry_path,
        key_cols=["fingerprint"],
        seq_col="seq",
        n_buckets=n_buckets,
    )


def start_incremental_dedup_ingest(
    stream_df: DataFrame,
    corpus_dir: str,
    registry_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the incremental-dedup ingest pipeline over a stream of docs.

    Output layout is ``corpus_dir/batch_id=N/`` with per-batch dynamic
    partition overwrite, so a replayed batch rewrites its own partition
    (effectively-once, same contract as ``start_to_parquet_idempotent``).
    """
    os.makedirs(os.path.dirname(registry_path) or ".", exist_ok=True)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        survivors = dedup_batch_against_registry(
            batch, registry_path, id_col, text_col
        ).persist()
        try:
            spark = batch.sparkSession
            prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            try:
                (
                    survivors.drop("fingerprint")
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .partitionBy("batch_id")
                    .parquet(corpus_dir)
                )
            finally:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
            register_fingerprints(
                survivors, registry_path, batch_id, id_col, n_buckets
            )
        finally:
            survivors.unpersist()

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
