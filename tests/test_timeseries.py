"""Time-series operator tests.

Two layers, mirroring the curation/llm_ops test files:

* oracle-compare all plans.timeseries queries at sf0.001 (the same
  check the driver runs at sf0.01);
* unit tests for the operator edges the driver's cohort-bounded oracle
  queries never reach — single observation, leading/trailing gaps,
  all-NULL frames, negative (pre-1970) timestamps, multi-key isolation.
"""

import math

import pytest
from pyspark.sql import functions as F

from near_event_streams_spark.operators import timeseries as tsop
from near_event_streams_spark.plans.timeseries import ORACLE_SQL, QUERIES
from tests.conftest import SF_DIR
from tests.oracle import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    compare(df, duck, ORACLE_SQL[name], name=name)


# ---------------------------------------------------------------------------
# bucket_start: floor semantics either side of the epoch
# ---------------------------------------------------------------------------


def test_bucket_start_floors_negative_timestamps(spark):
    """pmod semantics: -100 with bucket 60 belongs to [-120, -60), not
    the truncating-modulo answer -60 (the bucket AFTER the instant)."""
    df = spark.createDataFrame(
        [(-100,), (-60,), (-1,), (0,), (59,), (60,)], "t long"
    ).select(tsop.bucket_start(F.col("t"), 60).alias("b"), "t")
    got = {r["t"]: r["b"] for r in df.collect()}
    assert got == {-100: -120, -60: -60, -1: -60, 0: 0, 59: 0, 60: 60}


# ---------------------------------------------------------------------------
# gapfill_grid
# ---------------------------------------------------------------------------


def _obs(spark, rows):
    return spark.createDataFrame(rows, "k string, bucket long, v double")


def test_gapfill_single_observation_yields_one_grid_row(spark):
    grid = tsop.gapfill_grid(
        _obs(spark, [("a", 100, 1.0)]), ["k"], "bucket", 10
    )
    rows = grid.collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 100
    assert rows[0]["v"] == 1.0


def test_gapfill_fills_interior_buckets_with_nulls(spark):
    grid = tsop.gapfill_grid(
        _obs(spark, [("a", 100, 1.0), ("a", 140, 5.0)]), ["k"], "bucket", 10
    ).orderBy("bucket")
    rows = grid.collect()
    assert [r["bucket"] for r in rows] == [100, 110, 120, 130, 140]
    assert [r["v"] for r in rows] == [1.0, None, None, None, 5.0]


def test_gapfill_spans_are_per_key(spark):
    """Each key's grid spans ITS OWN [min, max] — key b must not inherit
    key a's span (that's what keeps the blow-up bounded at scale)."""
    grid = tsop.gapfill_grid(
        _obs(
            spark,
            [("a", 0, 1.0), ("a", 40, 2.0), ("b", 1000, 3.0), ("b", 1010, 4.0)],
        ),
        ["k"],
        "bucket",
        10,
    )
    by_key = {
        k: sorted(r["bucket"] for r in rows)
        for k, rows in [
            (k, [r for r in grid.collect() if r["k"] == k]) for k in ("a", "b")
        ]
    }
    assert by_key["a"] == [0, 10, 20, 30, 40]
    assert by_key["b"] == [1000, 1010]


def test_gapfill_empty_observed_frame(spark):
    obs = _obs(spark, []).filter("1=0")
    assert tsop.gapfill_grid(obs, ["k"], "bucket", 10).count() == 0


# ---------------------------------------------------------------------------
# locf / interpolate_linear on the gap-filled grid
# ---------------------------------------------------------------------------


def test_locf_carries_last_observation_not_leading_nulls(spark):
    grid = tsop.gapfill_grid(
        _obs(spark, [("a", 10, 2.0), ("a", 40, 8.0)]), ["k"], "bucket", 10
    )
    out = tsop.locf(grid, ["k"], "bucket", "v", "v_locf").orderBy("bucket")
    assert [r["v_locf"] for r in out.collect()] == [2.0, 2.0, 2.0, 8.0]


def test_interpolate_linear_exact_midpoints_and_boundary_nulls(spark):
    """Interior gap (10→40) interpolates exactly; rows before the first
    and after the last observation have no anchor on one side and must
    stay NULL."""
    rows = [
        ("a", 0, None),  # leading: no previous anchor
        ("a", 10, 2.0),
        ("a", 20, None),  # interior: 2 + (8-2)*(20-10)/(40-10) = 4
        ("a", 30, None),  # interior: 6
        ("a", 40, 8.0),
        ("a", 50, None),  # trailing: no next anchor
    ]
    df = spark.createDataFrame(rows, "k string, bucket long, v double")
    out = tsop.interpolate_linear(df, ["k"], "bucket", "v", "vi").orderBy(
        "bucket"
    )
    got = [r["vi"] for r in out.collect()]
    assert got[0] is None and got[-1] is None
    assert got[1:5] == [2.0, 4.0, 6.0, 8.0]


def test_interpolate_keys_do_not_bleed(spark):
    """A gap in key a must interpolate from a's anchors only, even when
    key b has closer observations in bucket order."""
    rows = [
        ("a", 0, 0.0),
        ("a", 10, None),
        ("a", 20, 10.0),
        ("b", 10, 100.0),
    ]
    df = spark.createDataFrame(rows, "k string, bucket long, v double")
    out = tsop.interpolate_linear(df, ["k"], "bucket", "v", "vi")
    a10 = [r for r in out.collect() if r["k"] == "a" and r["bucket"] == 10]
    assert a10[0]["vi"] == 5.0


# ---------------------------------------------------------------------------
# ewma_fold
# ---------------------------------------------------------------------------


def _ewma_ref(values, alpha, lookback):
    """Driver-side reference: per row, fold the non-NULL values of the
    trailing (lookback+1)-row frame; empty frame -> None."""
    out = []
    for i in range(len(values)):
        frame = [
            v for v in values[max(0, i - lookback) : i + 1] if v is not None
        ]
        if not frame:
            out.append(None)
            continue
        acc = frame[0]
        for x in frame[1:]:
            acc = (1 - alpha) * acc + alpha * x
        out.append(acc)
    return out


def test_ewma_matches_reference_recurrence(spark):
    vals = [1.0, 3.0, 2.0, 10.0, 4.0, 4.0, 0.5]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = (
        tsop.ewma_fold(df, ["k"], ["t"], "v", alpha=0.25, lookback=3, alias="e")
        .orderBy("t")
        .collect()
    )
    exp = _ewma_ref(vals, 0.25, 3)
    assert all(
        math.isclose(r["e"], e, rel_tol=1e-12) for r, e in zip(out, exp)
    )


def test_ewma_skips_nulls_and_null_frame_yields_null(spark):
    """NULL values are skipped by the fold (collect_list drops them);
    rows whose whole trailing frame is NULL yield NULL instead of
    erroring under ANSI mode."""
    vals = [None, None, 4.0, None, 8.0]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    prev = df.sparkSession.conf.get("spark.sql.ansi.enabled")
    df.sparkSession.conf.set("spark.sql.ansi.enabled", "true")
    try:
        out = (
            tsop.ewma_fold(
                df, ["k"], ["t"], "v", alpha=0.25, lookback=2, alias="e"
            )
            .orderBy("t")
            .collect()
        )
    finally:
        df.sparkSession.conf.set("spark.sql.ansi.enabled", prev)
    got = [r["e"] for r in out]
    assert got[0] is None and got[1] is None
    assert got[2] == 4.0
    assert got[3] == 4.0  # frame {4.0} after dropping the NULLs
    # frame rows t=3..4 -> non-null {8.0}? no: lookback=2 at t=4 covers
    # t=2..4 -> {4.0, 8.0} -> 0.75*4 + 0.25*8 = 5.0
    assert got[4] == 5.0


def test_ewma_single_row_is_identity(spark):
    df = spark.createDataFrame([("a", 0, 7.5)], "k string, t long, v double")
    out = tsop.ewma_fold(
        df, ["k"], ["t"], "v", alpha=0.5, lookback=8, alias="e"
    ).collect()
    assert out[0]["e"] == 7.5


def test_ewma_partitions_isolate_keys(spark):
    rows = [("a", 0, 1.0), ("a", 1, 2.0), ("b", 0, 100.0), ("b", 1, 200.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = tsop.ewma_fold(
        df, ["k"], ["t"], "v", alpha=0.5, lookback=4, alias="e"
    )
    got = {(r["k"], r["t"]): r["e"] for r in out.collect()}
    assert got[("a", 1)] == 1.5 and got[("b", 1)] == 150.0


# ---------------------------------------------------------------------------
# rollup_cascade validation
# ---------------------------------------------------------------------------


def test_rollup_cascade_rejects_non_multiple_resolutions(spark):
    df = spark.createDataFrame([(0, 1.0)], "t long, v double")
    with pytest.raises(ValueError):
        tsop.rollup_cascade(
            df, F.col("t"), F.col("v"), resolutions_us=[10, 25]
        )
    with pytest.raises(ValueError):
        tsop.rollup_cascade(
            df, F.col("t"), F.col("v"), resolutions_us=[20, 10]
        )


def test_rollup_cascade_coarse_level_equals_direct_aggregation(spark):
    """The cascaded 1h level (re-aggregated from 15m) must equal
    aggregating the raw rows directly at 1h — the exactness claim that
    justifies scanning the fact table only once."""
    rows = [(i * 300, float(i)) for i in range(48)]  # 5-min points, 4 hours
    df = spark.createDataFrame(rows, "t long, v double")
    out = tsop.rollup_cascade(
        df, F.col("t"), F.col("v"), resolutions_us=[900, 3600]
    )
    coarse = {
        r["bucket_start_us"]: (r["n_events"], float(r["sum_value"]))
        for r in out.filter("resolution_us = 3600").collect()
    }
    direct = {
        r["b"]: (r["n"], float(r["s"]))
        for r in df.groupBy(
            tsop.bucket_start(F.col("t"), 3600).alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert coarse == direct and len(coarse) == 4
