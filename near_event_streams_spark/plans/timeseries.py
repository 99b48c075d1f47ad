"""Time-series query surface over the events table: hypertable-style
rollup cascade, gap-fill with LOCF, linear interpolation, EWMA.

All four queries are exact-oracled. Determinism notes:

* bucket math is integer epoch-µs arithmetic (no timestamp truncation);
* sums are exact decimals cast to double at the output boundary;
* interpolation divides doubles with the identical expression shape in
  both engines (IEEE ops on identical operands are bit-identical);
* the EWMA fold uses only ``*``/``+`` in the lambda (no ``pow``), and
  BOTH engines evaluate the same truncated-lookback fold, so the
  truncation is part of the operator's definition, not an error term.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_event_streams_spark.operators import timeseries as tsop
from near_event_streams_spark.plans._common import (
    _t,
    dec,
    half_up6_duck,
    half_up6_spark,
    half_up_signed_duck,
    half_up_signed_spark,
    ts_us,
)

US_15M = 15 * 60 * 1_000_000
US_1H = 4 * US_15M
US_6H = 6 * US_1H

# --------------------------------------------------------------------------
# Rollup cascade: raw → 15m (the only full shuffle) → 1h → 6h.
# Scale: the 100 TB scan is aggregated exactly once; coarser levels
# re-aggregate the finest aggregate (bounded by time-span / 15m rows).
# --------------------------------------------------------------------------


def ts_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = tsop.rollup_cascade(
        ev,
        ts_us=ts_us(),
        value=dec("value"),
        resolutions_us=[US_15M, US_1H, US_6H],
    )
    return out.select(
        "resolution_us",
        "bucket_start_us",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    ).orderBy("resolution_us", "bucket_start_us")


TS_ROLLUP_CASCADE_SQL = """
WITH base AS (
  SELECT epoch_ns(ts) // 1000 AS t_us,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events
)
SELECT resolution_us, bucket_start_us, n_events, sum_value
FROM (
  SELECT CAST(900000000 AS BIGINT) AS resolution_us,
         t_us - (((t_us % 900000000) + 900000000) % 900000000)
           AS bucket_start_us,
         COUNT(*) AS n_events,
         CAST(SUM(v) AS DOUBLE) AS sum_value
  FROM base GROUP BY 2
  UNION ALL
  SELECT CAST(3600000000 AS BIGINT),
         t_us - (((t_us % 3600000000) + 3600000000) % 3600000000),
         COUNT(*),
         CAST(SUM(v) AS DOUBLE)
  FROM base GROUP BY 2
  UNION ALL
  SELECT CAST(21600000000 AS BIGINT),
         t_us - (((t_us % 21600000000) + 21600000000) % 21600000000),
         COUNT(*),
         CAST(SUM(v) AS DOUBLE)
  FROM base GROUP BY 2
)
ORDER BY resolution_us, bucket_start_us
"""

# --------------------------------------------------------------------------
# Hourly per-user gap-fill. The observed frame is one row per
# (user, hour); the dense grid spans each user's own [min, max] hour.
# --------------------------------------------------------------------------

# user_id < 8: bounds the dense grid in the ORACLE query only — the
# operators are general (empty/single-bucket keys, leading/trailing
# gaps, negative timestamps are unit-tested in tests/test_timeseries.py)
_GAPFILL_USERS = 8


def _hourly_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < _GAPFILL_USERS)
    b = tsop.bucket_start(ts_us(), US_1H).alias("bucket_start_us")
    return (
        ev.select("user_id", b, dec("value").alias("v"))
        .groupBy("user_id", "bucket_start_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("double").alias("sum_value"),
        )
    )


_HOURLY_OBS_SQL = f"""
  SELECT user_id,
         (epoch_ns(ts) // 1000)
           - ((((epoch_ns(ts) // 1000) % 3600000000) + 3600000000)
              % 3600000000)
           AS bucket_start_us,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
  FROM events
  WHERE user_id < {_GAPFILL_USERS}
  GROUP BY 1, 2
"""

_GRID_SQL = """
  spans AS (
    SELECT user_id,
           MIN(bucket_start_us) AS lo,
           MAX(bucket_start_us) AS hi
    FROM obs GROUP BY 1
  ),
  grid AS (
    SELECT user_id,
           UNNEST(generate_series(lo, hi, 3600000000)) AS bucket_start_us
    FROM spans
  ),
  filled AS (
    SELECT g.user_id, g.bucket_start_us, o.n_events, o.sum_value
    FROM grid g
    LEFT JOIN obs o
      ON o.user_id = g.user_id
     AND o.bucket_start_us = g.bucket_start_us
  )
"""


def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = _hourly_observed(spark, sf_dir)
    grid = tsop.gapfill_grid(
        obs, ["user_id"], "bucket_start_us", US_1H
    )
    out = tsop.locf(
        grid, ["user_id"], "bucket_start_us", "sum_value", "value_locf"
    )
    return out.select(
        "user_id",
        "bucket_start_us",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "value_locf",
    ).orderBy("user_id", "bucket_start_us")


TS_GAPFILL_LOCF_SQL = f"""
WITH obs AS ({_HOURLY_OBS_SQL}),
{_GRID_SQL}
SELECT user_id, bucket_start_us,
       COALESCE(n_events, 0) AS n_events,
       LAST_VALUE(sum_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket_start_us
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_locf
FROM filled
ORDER BY user_id, bucket_start_us
"""


def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = _hourly_observed(spark, sf_dir)
    grid = tsop.gapfill_grid(obs, ["user_id"], "bucket_start_us", US_1H)
    out = tsop.interpolate_linear(
        grid, ["user_id"], "bucket_start_us", "sum_value", "value_interp"
    )
    return out.select(
        "user_id", "bucket_start_us", "value_interp"
    ).orderBy("user_id", "bucket_start_us")


TS_INTERPOLATE_SQL = f"""
WITH obs AS ({_HOURLY_OBS_SQL}),
{_GRID_SQL},
anchored AS (
  SELECT user_id, bucket_start_us, sum_value,
         CAST(bucket_start_us AS DOUBLE) AS t,
         LAST_VALUE(sum_value IGNORE NULLS) OVER prev AS pv,
         LAST_VALUE(CASE WHEN sum_value IS NOT NULL
                         THEN CAST(bucket_start_us AS DOUBLE) END
                    IGNORE NULLS) OVER prev AS pt,
         FIRST_VALUE(sum_value IGNORE NULLS) OVER nxt AS nv,
         FIRST_VALUE(CASE WHEN sum_value IS NOT NULL
                          THEN CAST(bucket_start_us AS DOUBLE) END
                     IGNORE NULLS) OVER nxt AS nt
  FROM filled
  WINDOW
    prev AS (PARTITION BY user_id ORDER BY bucket_start_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    nxt AS (PARTITION BY user_id ORDER BY bucket_start_us
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, bucket_start_us,
       CASE WHEN sum_value IS NOT NULL THEN sum_value
            ELSE pv + (nv - pv) * (t - pt) / (nt - pt)
       END AS value_interp
FROM anchored
ORDER BY user_id, bucket_start_us
"""

# --------------------------------------------------------------------------
# Event-level EWMA smoothing (all users; bounded 32-row lookback).
# --------------------------------------------------------------------------

_EWMA_ALPHA = 0.25
_EWMA_LOOKBACK = 32


def ts_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "event_id", ts_us().alias("t_us"), "value"
    )
    out = tsop.ewma_fold(
        base,
        ["user_id"],
        ["t_us", "event_id"],
        "value",
        alpha=_EWMA_ALPHA,
        lookback=_EWMA_LOOKBACK,
        alias="ewma",
    )
    return out.select("user_id", "event_id", "t_us", "ewma").orderBy(
        "user_id", "t_us", "event_id"
    )


# NULLs are skipped by the fold on both engines: Spark's collect_list
# drops them implicitly, so the oracle list_filters its frame to match
# (DuckDB's list() retains NULLs); an all-NULL frame yields NULL.
TS_EWMA_SQL = f"""
WITH framed AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t_us,
         list_filter(
           list(value) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
             ROWS BETWEEN {_EWMA_LOOKBACK} PRECEDING AND CURRENT ROW
           ), x -> x IS NOT NULL
         ) AS vals
  FROM events
)
SELECT user_id, event_id, t_us,
       CASE WHEN len(vals) = 0 THEN NULL ELSE
         list_reduce(
           vals, (acc, x) -> {1.0 - _EWMA_ALPHA} * acc + {_EWMA_ALPHA} * x
         )
       END AS ewma
FROM framed
ORDER BY user_id, t_us, event_id
"""



def ts_seasonal_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal baseline: per (event_type, hour-of-day) event count and
    exact-decimal mean value — the calendar profile anomaly detection
    subtracts before looking for residuals (a spike at 3am means more
    than the same count at noon).

    One hash agg on the bounded (type × 24) keyspace; the hour is
    pure codegen date arithmetic on the epoch-micros column. The mean
    divides exact decimal sums so both engines agree bit-for-bit.

    Hour-of-day is computed with FLOOR-division semantics (subtract
    the ``pmod`` remainder first, as ``tsop.bucket_start`` does, then
    ``pmod`` the bucket index by 24) so the expression is total over
    pre-1970 epochs too — Spark's truncating ``div`` + sign-following
    ``%`` would yield negative "hours" there. The oracle mirrors with
    ``((h % 24) + 24) % 24`` on DuckDB's floor ``//``.
    """
    ev = _t(spark, sf_dir, "events")
    us_h = F.lit(3_600_000_000).cast("long")
    t = ts_us()
    hour = F.pmod(
        F.call_function("div", t - F.pmod(t, us_h), us_h), F.lit(24)
    ).cast("int")
    return (
        ev.withColumn("v_dec", dec("value"))
        .groupBy("event_type", hour.alias("hour_utc"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # HALF_UP 6dp in exact integer cents (functions/rounding):
            # ROUND on a double quotient ties-breaks differently across
            # engines when n_events is a power of 2×5. Signed variant —
            # events.value is non-negative in the current fixtures, but
            # nothing in the schema forbids negative values, and the
            # unsigned helper silently diverges on a negative SUM
            # (Spark div truncates toward zero, DuckDB // floors).
            F.expr(
                half_up_signed_spark("sum(v_dec)*100", "count(1)", 6, 100)
            ).alias("avg_value"),
        )
        .orderBy("event_type", "hour_utc")
    )


TS_SEASONAL_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST((((epoch_ns(ts) // 1000 // 3600000000) % 24) + 24) % 24
              AS INT) AS hour_utc,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events
)
SELECT event_type, hour_utc,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {half_up_signed_duck("SUM(v)*100", "COUNT(*)", 6, 100)}
         AS avg_value
FROM base
GROUP BY event_type, hour_utc
ORDER BY event_type, hour_utc
"""


def ts_lag_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead–lag CROSS-CORRELATION between the click and purchase
    hourly count series at lags −3 … +3 hours — the "does activity in
    A anticipate activity in B" read (positive-lag peak ⇒ clicks lead
    purchases). Hours present in BOTH series at the shifted alignment
    correlate (inner join on the shifted hour — documented choice: no
    zero-imputation bias). One bounded hour-key aggregate, a 7-row lag
    spine broadcast, one equi-join on the shifted hour, one 7-key
    moment aggregate; all moments are exact integers so the closed
    form runs identical flops on both engines (the
    ``stats_corr_regression`` shape).

    Residual cross-engine risk (accepted, per the
    ``stats_corr_regression`` precedent): the final ``ROUND(corr, 6)``
    acts on a double quotient involving ``sqrt``, so it relies on a
    correlation never landing on an exact 6dp half-tie rather than on
    integer-arithmetic construction — a half-tie would require the
    irrational denominator to conspire to a terminating decimal, which
    the sqrt makes measure-zero but not impossible."""
    us_h = 3_600_000_000
    ev = _t(spark, sf_dir, "events")
    t = ts_us()
    hour = F.call_function(
        "div", t - F.pmod(t, F.lit(us_h).cast("long")),
        F.lit(us_h).cast("long"),
    )
    hourly = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", hour.alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    a = hourly.filter(F.col("event_type") == "click").select(
        F.col("h").alias("ha"), F.col("cnt").alias("x")
    )
    b = hourly.filter(F.col("event_type") == "purchase").select(
        F.col("h").alias("hb"), F.col("cnt").alias("y")
    )
    lags = spark.range(-3, 4).select(F.col("id").alias("lag_hours"))
    j = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("ha") + F.col("lag_hours") == F.col("hb"))
    )
    g = j.groupBy("lag_hours").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_n = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return g.select(
        "lag_hours",
        F.col("n").alias("n_hours"),
        F.when(den > 0, F.round(cov_n / den, 6)).alias("lag_corr"),
    ).orderBy("lag_hours")


TS_LAG_CORR_SQL = """
WITH hourly AS (
  SELECT event_type,
         epoch_ns(ts) // 1000 // 3600000000 AS h,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
), a AS (
  SELECT h AS ha, cnt AS x FROM hourly WHERE event_type = 'click'
), b AS (
  SELECT h AS hb, cnt AS y FROM hourly WHERE event_type = 'purchase'
), lags AS (
  SELECT CAST(x AS BIGINT) AS lag_hours FROM unnest(range(-3, 4)) t(x)
), g AS (
  SELECT lag_hours,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM a CROSS JOIN lags JOIN b ON ha + lag_hours = hb
  GROUP BY lag_hours
)
SELECT lag_hours, n_hours,
       CASE WHEN den > 0 THEN ROUND(cov_n / den, 6) END AS lag_corr
FROM (
  SELECT lag_hours, n AS n_hours,
         CAST(n AS DOUBLE) * sxy
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
         sqrt((CAST(n AS DOUBLE) * sxx
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * syy
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS den
  FROM g
)
ORDER BY lag_hours
"""


def ts_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change per event type: exact decimal
    monthly sums, and the percent change ``(cur−prev)/prev`` rounded
    by the SIGNED integer HALF_UP helper — a ratio of exact decimals,
    so the r6 tie class cannot reach it. First month per type is NULL
    (no prior); a zero prev month guards to NULL on both engines."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    month = F.date_format(
        F.col("ts").cast("timestamp"), "yyyy-MM"
    ).alias("month")
    m = ev.groupBy("event_type", month).agg(
        F.sum(dec("value")).alias("mv")
    )
    w = Window.partitionBy("event_type").orderBy("month")
    m2 = m.withColumn("prev_mv", F.lag("mv").over(w))
    pct = F.when(
        F.col("prev_mv") > 0,
        F.expr(
            # num and den BOTH carry the x100 cents scale, so the
            # ratio needs no num_scale correction
            half_up_signed_spark(
                "(mv - prev_mv)*100",
                "CAST(prev_mv*100 AS DECIMAL(38,0))",
                6,
                1,
            )
        ),
    )
    return m2.select(
        "event_type",
        "month",
        F.col("mv").cast("double").alias("month_value"),
        pct.alias("mom_change"),
    ).orderBy("event_type", "month")


TS_MOM_SQL = f"""
WITH m AS (
  SELECT event_type, strftime(ts, '%Y-%m') AS month,
         SUM(CAST(value AS DECIMAL(12,2))) AS mv
  FROM events GROUP BY 1, 2
), m2 AS (
  SELECT event_type, month, mv,
         lag(mv) OVER (PARTITION BY event_type ORDER BY month) AS prev_mv
  FROM m
), mi AS (
  SELECT event_type, month, mv,
         CAST(mv*100 AS HUGEINT) AS mv100,
         CAST(prev_mv*100 AS HUGEINT) AS prev100
  FROM m2
)
SELECT event_type, month, CAST(mv AS DOUBLE) AS month_value,
       CASE WHEN prev100 > 0
            THEN {half_up_signed_duck(
                "mv100 - prev100", "prev100", 6, 1)}
            END AS mom_change
FROM mi ORDER BY event_type, month
"""


def ts_trailing_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-RANGE window frame — per user, the trailing-1-hour event
    count and exact-decimal value sum at every event (the "rolling
    spend in the last hour" feature): ``rangeBetween`` over epoch
    MICROS, not rows, so bursts widen the frame's row count while the
    time span stays fixed. This is the frame family the ±500-key
    numeric range demo does not cover; in a feature pipeline it is the
    point-in-time-correct aggregation (no future leakage: frame ends
    at CURRENT ROW).

    One user-key exchange shared by both frames; equal-timestamp ties
    are inside one range frame on both engines, so tie order cannot
    change any sum. Bounded presentation: top 200 by (user, ts,
    event_id) — a total order.

    Scale: one shuffle on user_id; per-partition sort; the frame scan
    is the classic sliding-window merge, linear per key. Skewed hot
    users are single-key-partition-bound like any per-key window —
    the salting escape hatch (operators/skew.py) applies when one user
    dominates."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    t = ts_us()
    us_h = 3_600_000_000
    base = ev.select(
        "event_id",
        "user_id",
        t.alias("t_us"),
        dec("value").alias("v_dec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-us_h, 0)
    )
    return (
        base.select(
            "user_id",
            F.col("t_us"),
            "event_id",
            F.count(F.lit(1)).over(w).alias("n_last_hour"),
            F.sum("v_dec").over(w).cast("double").alias("sum_last_hour"),
        )
        .orderBy("user_id", "t_us", "event_id")
        .limit(200)
    )


TS_TRAILING_SQL = """
SELECT user_id,
       epoch_ns(ts) // 1000 AS t_us,
       event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
         AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY user_id, t_us, event_id
LIMIT 200
"""


def ts_anomaly_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline ANOMALY SCORING — the consumer of
    ``ts_seasonal_hourly``'s calendar profile: bucket events into
    (event_type, day, hour-of-day) counts, compute each type+hour-of-
    day's across-days baseline, and score every day-bucket by its
    ratio to baseline (a 3am spike scores against 3am's own norm, not
    the global mean). The ratio is exact integer arithmetic —
    ``cnt·n_day_buckets / total`` through the HALF_UP helper — so both
    engines agree bit-for-bit. Top 20 by ratio under a total order:
    the "which hours were most anomalous" report.

    Scale: two bounded hash aggregates (day-buckets, then type×24
    baselines) + one broadcast-sized join back; no window over the raw
    stream."""
    ev = _t(spark, sf_dir, "events")
    t = ts_us()
    us_h = F.lit(3_600_000_000).cast("long")
    us_d = F.lit(86_400_000_000).cast("long")
    day = F.call_function("div", t - F.pmod(t, us_d), us_d)
    hod = F.pmod(
        F.call_function("div", t - F.pmod(t, us_h), us_h), F.lit(24)
    ).cast("int")
    buckets = ev.groupBy(
        F.col("event_type"), day.alias("day"), hod.alias("hour_utc")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    baseline = buckets.groupBy("event_type", "hour_utc").agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_days")
    )
    scored = buckets.join(
        F.broadcast(baseline), ["event_type", "hour_utc"]
    ).select(
        "event_type",
        "day",
        "hour_utc",
        "cnt",
        F.expr(half_up6_spark("cnt * n_days", "total")).alias("ratio"),
    )
    return scored.orderBy(
        F.col("ratio").desc(), "event_type", "day", "hour_utc"
    ).limit(20)


TS_ANOMALY_SQL = f"""
WITH b AS (
  SELECT event_type,
         epoch_ns(ts) // 1000 // 86400000000 AS day,
         CAST((((epoch_ns(ts) // 1000 // 3600000000) % 24) + 24) % 24
              AS INT) AS hour_utc,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2, 3
), base AS (
  SELECT event_type, hour_utc,
         CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM b GROUP BY 1, 2
)
SELECT b.event_type, CAST(b.day AS BIGINT) AS day, b.hour_utc, b.cnt,
       {half_up6_duck("b.cnt * base.n_days", "base.total")} AS ratio
FROM b JOIN base USING (event_type, hour_utc)
ORDER BY ratio DESC, b.event_type, b.day, b.hour_utc
LIMIT 20
"""



QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ts_seasonal_hourly": ts_seasonal_hourly,
    "ts_trailing_window_sum": ts_trailing_window_sum,
    "ts_anomaly_residuals": ts_anomaly_residuals,
    "ts_lag_correlation": ts_lag_correlation,
    "ts_month_over_month": ts_month_over_month,
    "ts_rollup_cascade": ts_rollup_cascade,
    "ts_gapfill_locf": ts_gapfill_locf,
    "ts_interpolate_linear": ts_interpolate_linear,
    "ts_ewma_smooth": ts_ewma_smooth,
}

ORACLE_SQL: dict[str, str] = {
    "ts_seasonal_hourly": TS_SEASONAL_SQL,
    "ts_trailing_window_sum": TS_TRAILING_SQL,
    "ts_anomaly_residuals": TS_ANOMALY_SQL,
    "ts_lag_correlation": TS_LAG_CORR_SQL,
    "ts_month_over_month": TS_MOM_SQL,
    "ts_rollup_cascade": TS_ROLLUP_CASCADE_SQL,
    "ts_gapfill_locf": TS_GAPFILL_LOCF_SQL,
    "ts_interpolate_linear": TS_INTERPOLATE_SQL,
    "ts_ewma_smooth": TS_EWMA_SQL,
}
