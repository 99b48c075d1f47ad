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
    return load_table(spark, sf_dir, name)


# HALF_UP rounding family lives in functions/rounding.py (neutral layer
# importable from both operators and plans); re-exported here for the
# query modules' convenience.
from near_event_streams_spark.functions.rounding import (  # noqa: F401,E402
    half_up6_duck,
    half_up6_spark,
    half_up_signed_duck,
    half_up_signed_spark,
)


def ts_us(col_name: str = "ts") -> Column:
    """``events.ts`` (parquet timestamp[us], read as TIMESTAMP_NTZ) →
    epoch microseconds. Session timezone is pinned to UTC (session.py),
    so the NTZ→LTZ cast is wall-clock identity and ``unix_micros``
    matches DuckDB ``epoch_ns(ts)//1000`` exactly."""
    return F.unix_micros(F.col(col_name).cast("timestamp"))


# per-prefix scratch dirs handed out in this process, oldest first
# (see scratch_dir's grace-window contract)
_SCRATCH_DIRS: dict[str, list[str]] = {}


def scratch_dir(kind: str, sf_dir: str, keep_dir: bool = False) -> str:
    """Scratch dir for gated queries that WRITE a layout and return a
    LAZY DataFrame over it (variant roundtrips, upsert-store gates, the
    persisted ANN indexes, the csv/json format gate). A fixed
    rmtree-then-rewrite path breaks two ways: a DataFrame handed back
    by an earlier invocation reads a wiped dir when the next call
    rmtrees it before the caller collects (the driver collects AFTER
    the query function returns), and a second concurrent session on
    the same ``sf_dir`` can observe a half-rewritten store. So:
    per-call unique ``mkdtemp``, tracked per ``(kind, sf_dir)`` prefix,
    with a 3-call grace window — older dirs are reaped so repeated
    bench runs don't leak /tmp space.

    ``keep_dir=False`` (default) removes the fresh dir before
    returning — Spark's parquet/csv/json writers want a non-existent
    target. ``keep_dir=True`` hands back the existing empty dir for
    callers that write SUBPATHS under it (the ANN index layouts)."""
    import hashlib
    import shutil
    import tempfile

    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    prefix = f"nes_{kind}_{digest}_"
    paths = _SCRATCH_DIRS.setdefault(prefix, [])
    path = tempfile.mkdtemp(prefix=prefix)
    paths.append(path)
    # reap AFTER appending so steady state holds exactly 3 dirs — the
    # documented grace window; reaping before the append retained 4
    # (r13 advisory)
    while len(paths) > 3:
        shutil.rmtree(paths.pop(0), ignore_errors=True)
    if not keep_dir:
        shutil.rmtree(path, ignore_errors=True)
    return path
