"""Partitioned parquet sink — the data-layout half of the 100 TB story.

The reference's only sink is Kafka; durable event tables are what its
downstream consumers build. This writer encodes the layout rules a
100 TB event table needs:

* **Hive partitioning on low-cardinality time/route keys** (e.g.
  ``event_date``, ``event_type``) so every time/route-bounded query
  partition-prunes at the file listing, before any I/O.
* **One shuffle to co-locate partition values** (``repartition`` on the
  partition columns) so each task writes whole partition directories —
  without it every task writes a sliver of every partition and a day's
  ingest produces millions of KB-sized files.
* **``sortWithinPartitions`` on the query keys** (e.g. contract, user)
  giving run-length/dictionary-friendly pages and per-file min/max
  statistics tight enough for row-group skipping.
* **``maxRecordsPerFile``** bounds file size so a skewed partition value
  still splits into parallel-scannable files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    sort_within: Sequence[str] = (),
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Write a partition-pruned, scan-friendly parquet table."""
    shaped = df.repartition(*[df[c] for c in partition_by])
    if sort_within:
        shaped = shaped.sortWithinPartitions(*sort_within)
    (
        shaped.write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int = 32,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (hash-clustered) table — the co-located-join layout.

    Two fact tables bucketed on their join key with the same bucket count
    sort-merge-join with ZERO shuffle exchange (asserted in
    tests/test_plan_quality.py): at 100 TB that's the difference between
    re-shuffling both tables per join and reading pre-clustered buckets.
    Bucketing requires the table catalog (``saveAsTable``) because bucket
    metadata lives in the metastore, not in the parquet files.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, *bucket_by
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def compact_batches(
    spark,
    batch_dir: str,
    out_path: str,
    partition_by: Sequence[str],
    sort_within: Sequence[str] = (),
    max_records_per_file: int = 5_000_000,
) -> int:
    """Compact a ``batch_id=N``-layout table (the idempotent streaming
    sink's output) into a query-partitioned table.

    Streaming leaves one directory per micro-batch — correct for replay
    safety, wrong for readers once batches number in the thousands.
    Periodic compaction rewrites closed batches into the analytical
    layout (partition pruning + sorted pages). Returns rows compacted.
    Scale: runs as an ordinary batch job over closed batch partitions;
    writers keep appending new ``batch_id`` dirs concurrently because
    compaction only reads.
    """
    df = spark.read.option("basePath", batch_dir).parquet(batch_dir)
    df = df.drop("batch_id")
    n = df.count()
    write_partitioned(
        df,
        out_path,
        partition_by=partition_by,
        sort_within=sort_within,
        max_records_per_file=max_records_per_file,
    )
    return n
