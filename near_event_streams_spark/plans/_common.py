"""Shared helpers for the analytics query surface.

Determinism rules (see plans/analytics.py module docstring): doubles are
summed as exact decimals and cast back, events timestamps flow as
truncated epoch-micros, every LIMIT is totally ordered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from near_event_streams_spark.sources.tables import load_table


def dec(c: Column | str, prec: int = 12, scale: int = 2) -> Column:
    """Exact-decimal view of a 2dp-by-construction double column."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({prec},{scale})")


def dsum(c: Column, alias: str) -> Column:
    """Deterministic double sum: exact decimal sum → double."""
    return F.sum(c).cast("double").alias(alias)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # TIMESTAMP(NANOS) parquet: read ts as raw int64 nanoseconds.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return load_table(spark, sf_dir, name)


def ts_us(col_name: str = "ts") -> Column:
    """ns → µs with truncating integer division (matches DuckDB
    ``epoch_ns(ts)//1000``; float division would round and drift by 1µs)."""
    return F.expr(f"{col_name} div 1000").cast("long")
