"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness-at-scale first:

* AQE on (runtime re-planning, skew-join splitting, partition coalescing)
  so plans survive a 100x scale-up without hand-tuning.
* ``spark.sql.shuffle.partitions`` sized for the local harness; on a real
  cluster AQE's coalescing makes the static number mostly irrelevant.
* Arrow on for every pandas-UDF boundary (the LLM ops hot path).
* Broadcast threshold left at default — small dims (region/nation/tokens)
  broadcast automatically; plans also add explicit ``broadcast()`` hints
  where the dimension is known-small by construction.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

# Single knob the bench driver controls.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "near-event-streams-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with scale-oriented defaults."""
    cpus = _DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else cpus),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet scans: let filters and column pruning reach the reader.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Streaming micro-batch state store kept default (HDFS-backed); the
        # parity pipeline is stateless so state store choice is not hot.
        .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


@contextmanager
def partition_overwrite_mode(spark: SparkSession, mode: str):
    """Scope ``spark.sql.sources.partitionOverwriteMode`` to a block,
    restoring the caller's session value on exit. Four write paths need
    a specific mode (the ingest sinks want 'dynamic' so a replayed
    batch rewrites only its own partition; the index writers pin
    'static' so a retrained layout cannot leave stale partition dirs
    behind) and none of them may leak the change into the caller's
    session (r13 review: the save/set/restore dance was hand-rolled at
    every site)."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
