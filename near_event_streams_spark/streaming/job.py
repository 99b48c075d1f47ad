"""The reference's streaming job, re-expressed as Structured Streaming.

Maps the reference's run loop (``src/main.rs:111-141`` listen_blocks →
``handle_message`` → ``store_events``) onto:

    readStream (file/Kafka StreamerMessage source)
      → extract_events (explode×3, filter, parse, validate, emit_info)
      → whitelist/blacklist
      → routed_records (3-way topic fan-out as a union)
      → foreachBatch: per-key ordering + sink write

Semantics parity:

* at-least-once delivery with restart from checkpoint (the reference is
  at-least-once fire-and-await, ``src/events.rs:89-97``; its sync modes
  map to checkpoint/startingOffsets — ``src/configs.rs:101-127``).
* per-contract ordering inside each micro-batch via
  ``repartition(key) + sortWithinPartitions`` (done in ``foreachBatch``
  where the batch is a static frame — streaming frames cannot sort);
  cross-contract order is unconstrained, matching the reference's
  concurrent group sends (``src/events.rs:127-142``).
* rejected records (parse/validation failures) go to a side sink instead
  of only a warn log — a strict superset of the reference's behavior
  (``src/events.rs:325-344``).
* the ``concurrency`` knob maps to ``maxFilesPerTrigger`` /
  ``maxOffsetsPerTrigger`` pacing (``src/configs.rs:79-81``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from near_event_streams_spark.config import NesConfig
from near_event_streams_spark.operators.extract import extract_events
from near_event_streams_spark.operators.routing import (
    apply_blacklist,
    apply_whitelist,
    ordered_for_sink,
    routed_records,
)


def build_routed_stream(
    messages: DataFrame, config: NesConfig
) -> tuple[DataFrame, DataFrame]:
    """(routed (topic,key,value,block_height) frame, rejected frame).

    Works identically on static and streaming inputs — every op is narrow.
    """
    events, rejected = extract_events(messages)
    events = apply_whitelist(events, config.whitelist_contract_ids)
    events = apply_blacklist(events, config.blacklist_contract_ids)
    routed = routed_records(
        events,
        topic_prefix=config.topic_prefix,
        all_topic=config.near_events_all_topic,
    )
    return routed, rejected


def start_to_parquet(
    messages: DataFrame,
    config: NesConfig,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the pipeline into a parquet sink (test/replay target).

    ``foreachBatch`` applies the per-key ordering discipline then appends.
    """
    routed, _ = build_routed_stream(messages, config)

    def _write(batch: DataFrame, batch_id: int) -> None:
        ordered_for_sink(batch).write.mode("append").parquet(out_dir)

    writer = (
        routed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_write)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_to_kafka(
    messages: DataFrame,
    config: NesConfig,
    checkpoint_dir: str,
    bootstrap_servers: str,
) -> StreamingQuery:
    """Run the pipeline into Kafka with dynamic topic routing.

    One sink, ``topic`` column per record — the 3-way fan-out is already a
    union upstream. Requires the spark-sql-kafka package on the cluster.
    """
    routed, _ = build_routed_stream(messages, config)

    def _write(batch: DataFrame, batch_id: int) -> None:
        (
            ordered_for_sink(batch)
            .select("topic", "key", "value")
            .write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            # per-key order preservation at the producer
            .option("kafka.max.in.flight.requests.per.connection", "1")
            .save()
        )

    return (
        routed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_write)
        .start()
    )


def start_rejected_sink(
    messages: DataFrame,
    config: NesConfig,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Side stream of rejected rows (reason + raw log) — the warn-and-drop
    path made durable."""
    _, rejected = build_routed_stream(messages, config)
    keep = rejected.select(
        "block_height",
        "shard_id",
        "receipt_id",
        "contract_account_id",
        "log",
        "reject_reason",
    )
    writer = (
        keep.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --------------------------------------------------------------------------
# Streaming analytics on the event stream (beyond the reference: the
# watermarked aggregations the reference delegates to Kafka consumers).
# --------------------------------------------------------------------------


def event_time(events: DataFrame) -> DataFrame:
    """Derive an event-time column from the ns block timestamp."""
    return events.withColumn(
        "event_ts",
        F.timestamp_micros(
            F.expr("emit_info.block_timestamp div 1000").cast("long")
        ),
    )


def windowed_contract_counts(
    events: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Tumbling-window per-contract event counts with late-data handling."""
    return (
        event_time(events)
        .withWatermark("event_ts", watermark)
        .groupBy(
            F.window("event_ts", window_duration).alias("w"),
            F.col("emit_info.contract_account_id").alias(
                "contract_account_id"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "contract_account_id",
            "n_events",
        )
    )


def dedup_receipts(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup on (receipt_id, event) within the watermark —
    collapses at-least-once redelivery to effectively-once output."""
    return (
        event_time(events)
        .withWatermark("event_ts", watermark)
        .dropDuplicates(["receipt_id", "standard", "event"])
    )


def dedup_receipts_within_watermark(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Bounded-state streaming dedup (``dropDuplicatesWithinWatermark``):
    unlike plain ``dropDuplicates`` — whose key state only expires when
    event-time columns are part of the dedup key — this guarantees every
    dedup key is evicted once the watermark passes it, so state size is
    O(keys per watermark window) regardless of run length. The right
    variant for an unbounded 24/7 ingest at 100 TB: redelivery happens
    within minutes, not days, so the watermark bounds both correctness
    and memory."""
    return (
        event_time(events)
        .withWatermark("event_ts", watermark)
        .dropDuplicatesWithinWatermark(["receipt_id", "standard", "event"])
    )


def with_batch_observability(
    events: DataFrame, name: str = "nes_metrics"
) -> DataFrame:
    """Attach ``observe()`` metrics to the event stream: per-micro-batch
    row/contract/height aggregates computed inside the running plan (no
    second pass over the data) and surfaced through
    ``StreamingQueryListener.onQueryProgress`` as ``observedMetrics[name]``
    — the Spark-native form of the reference's per-batch stats logging
    (``src/stats.rs:24-58``)."""
    return events.observe(
        name,
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("emit_info.contract_account_id").alias(
            "n_contracts"
        ),
        F.max("emit_info.block_height").alias("max_height"),
    )


def run_batches(
    stream_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
) -> StreamingQuery:
    """Generic runner: transform → foreachBatch sink, availableNow."""
    return (
        transform(stream_df)
        .writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )


def start_to_parquet_idempotent(
    messages: DataFrame,
    config: NesConfig,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Effectively-once parquet sink: each micro-batch overwrites its own
    ``batch_id=N`` partition, so a replayed batch (at-least-once
    foreachBatch redelivery after a crash between write and commit)
    rewrites identical data instead of appending duplicates.

    This is the improvement SURVEY §2.1 notes over the reference's
    at-least-once fire-and-await Kafka sends (``events.rs:89-97``):
    exactly-once needs sink-side idempotence, which a deterministic
    partition overwrite provides for file sinks. Scale: one partition
    dir per micro-batch; downstream readers prune on their own columns,
    so the batch_id layer costs only directory fan-out (compact
    periodically if batches are tiny).
    """
    routed, _ = build_routed_stream(messages, config)

    def _write(batch: DataFrame, batch_id: int) -> None:
        (
            ordered_for_sink(batch)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    writer = (
        routed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_write)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
