"""Analytics-layer query surface (SURVEY §2.2) with DuckDB oracle SQL.

Every entry in ``QUERIES`` is a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLE_SQL`` holds the equivalent ANSI SQL for DuckDB. Column names AND
dtypes are aligned pairwise — the correctness gate hash-compares values
after sorting columns by name.

Cross-engine determinism rules used throughout (the hard-won part):

* **Never aggregate raw doubles.** Summation order differs between engines;
  instead cast inputs to exact DECIMAL first (prices/quantities are 2dp by
  construction), sum exactly, and cast the final aggregate back to DOUBLE.
  Identical exact decimals → bit-identical doubles.
* **Derived ratios** (averages, stddev) are computed in DOUBLE *from exact
  decimal sums* with the same IEEE operation sequence in both engines.
* **Every LIMIT/top-k query totally orders** its rows (unique tiebreak
  column) so both engines select the same set.
* **Events timestamps are microsecond parquet** (timestamp[us], read as
  TIMESTAMP_NTZ); all events-derived time columns are emitted as BIGINT
  epoch-micros (``unix_micros`` under the UTC session timezone, matching
  DuckDB ``epoch_ns(ts)//1000``) to be timezone-agnostic.

Scale design notes are on each query; the common themes: group-by keys with
bounded cardinality (partial aggregation does the heavy lifting map-side),
dimension joins are broadcast, big-big joins shuffle on the join key only,
and window functions partition on high-cardinality keys (no single-partition
global windows except on already-tiny aggregates).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from near_event_streams_spark.plans._common import _t, dec, dsum, ts_us


# --------------------------------------------------------------------------
# Q1 — pricing summary (TPC-H Q1 shape): scan → filter → hash agg.
# Scale: 4-group agg ⇒ map-side partial aggregation reduces 100 TB to a few
# rows per task before the single tiny shuffle; filter + 7-column projection
# push down to the parquet scan.
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    tax = dec(F.lit(1.0) + F.col("l_tax"), 4, 2)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity"), "sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            dsum(dec("l_extendedprice") * disc, "sum_disc_price"),
            dsum(dec("l_extendedprice") * disc * tax, "sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            (
                F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1))
            ).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1))).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(1.0 - l_discount AS DECIMAL(4,2))
           * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# --------------------------------------------------------------------------
# Q3 — shipping priority: 3-way join, agg, total-order top-k.
# Scale: customer filter before join (pushdown); orders⋈lineitem shuffles on
# orderkey; top-10 via TakeOrdered (no global sort materialization).
# --------------------------------------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp_ntz")
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    disc = dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(dec("l_extendedprice") * disc, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

# --------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way join incl. two broadcast dims.
# Scale: region+nation are broadcast (tiny); supplier is broadcast;
# orders⋈lineitem is the only big-big shuffle.
# --------------------------------------------------------------------------


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    region = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    supplier = F.broadcast(_t(spark, sf_dir, "supplier"))
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = _t(spark, sf_dir, "lineitem")
    disc = dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (cust.c_nationkey == supplier.s_nationkey),
        )
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(dec("l_extendedprice") * disc, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

# --------------------------------------------------------------------------
# Join family: outer / semi / anti / range / as-of.
# --------------------------------------------------------------------------


def join_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + agg: customers keep a row even with zero orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(dec("o_totalprice")).cast("double"), F.lit(0.0)
            ).alias("total_spent"),
        )
    )


JOIN_OUTER_SQL = """
SELECT
  c_custkey,
  c_name,
  COUNT(o_orderkey) AS n_orders,
  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 0.0)
    AS total_spent
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — the whitelist op at table scale (SURVEY §2.1 op 8)."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
"""


def join_anti_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the blacklist op at table scale."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: parts binned into literal price bands.

    Scale: the band table is tiny → Spark picks BroadcastNestedLoopJoin,
    which is the right physical plan for band assignment at any scale.
    """
    part = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [
            ("low", 0.0, 1000.0),
            ("mid", 1000.0, 1500.0),
            ("high", 1500.0, 2000.0),
            ("lux", 2000.0, 1e9),
        ],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (
                F.sum(dec("p_retailprice")).cast("double") / F.count(F.lit(1))
            ).alias("avg_price"),
        )
        .orderBy("band")
    )


def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same price-band semantics as join_range_price_bands, but through
    the BINNED equi-join (operators/rangejoin.py) — the physical shape a
    LARGE band table needs (NLJ is O(facts × bands)). Bands here use a
    finite lux ceiling so every interval quantizes onto bins."""
    from near_event_streams_spark.operators.rangejoin import (
        binned_range_join,
    )

    part = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [
            ("low", 0.0, 1000.0),
            ("mid", 1000.0, 1500.0),
            ("high", 1500.0, 2000.0),
            ("lux", 2000.0, 10000.0),
        ],
        "band string, lo double, hi double",
    )
    return (
        binned_range_join(
            part, bands, value_col="p_retailprice", bin_width=500.0
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (
                F.sum(dec("p_retailprice")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_price"),
        )
        .orderBy("band")
    )


JOIN_RANGE_BINNED_SQL = """
SELECT
  band,
  COUNT(*) AS n_parts,
  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    AS avg_price
FROM part
JOIN (VALUES ('low', 0.0, 1000.0), ('mid', 1000.0, 1500.0),
             ('high', 1500.0, 2000.0), ('lux', 2000.0, 10000.0))
  AS bands(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
ORDER BY band
"""


JOIN_RANGE_SQL = """
SELECT
  band,
  COUNT(*) AS n_parts,
  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    AS avg_price
FROM part
JOIN (VALUES ('low', 0.0, 1000.0), ('mid', 1000.0, 1500.0),
             ('high', 1500.0, 2000.0), ('lux', 2000.0, 1000000000.0))
     AS bands(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
ORDER BY band
"""


def join_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior click.

    Spark has no native ASOF JOIN; the scalable composition is a tagged
    union + running ``last(…, ignorenulls)`` window — ONE shuffle on
    (user_id), no cross product, no per-row lookup. Oracle uses the
    identical window formulation (DuckDB's ASOF JOIN has different tie
    semantics, so we pin ties explicitly: at equal ts the click sorts
    first, i.e. a same-instant click is visible to the purchase).
    """
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        ts_us().alias("ts_us"),
        F.when(F.col("event_type") == "click", F.lit(0))
        .otherwise(F.lit(1))
        .alias("src"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.last(
        F.when(F.col("src") == 0, F.col("ts_us")), ignorenulls=True
    ).over(w)
    click_id = F.last(
        F.when(F.col("src") == 0, F.col("event_id")), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("click_ts_us", click_ts)
        .withColumn("click_event_id", click_id)
        .filter(F.col("src") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts_us").alias("purchase_ts_us"),
            "click_event_id",
            "click_ts_us",
        )
    )


JOIN_ASOF_SQL = """
WITH tagged AS (
  SELECT user_id, event_id, event_type,
         epoch_ns(ts) // 1000 AS ts_us,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS src
  FROM events
  WHERE event_type IN ('click', 'purchase')
), marked AS (
  SELECT *,
    LAST_VALUE(CASE WHEN src = 0 THEN ts_us END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts_us, src, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts_us,
    LAST_VALUE(CASE WHEN src = 0 THEN event_id END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts_us, src, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_event_id
  FROM tagged
)
SELECT user_id,
       event_id AS purchase_id,
       ts_us    AS purchase_ts_us,
       click_event_id,
       click_ts_us
FROM marked
WHERE src = 1
"""

# --------------------------------------------------------------------------
# Aggregation family: distinct, stats (exact-sum stddev), rollup, cube.
# --------------------------------------------------------------------------


def agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


AGG_DISTINCT_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def agg_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg/stddev per event_type — stddev from EXACT decimal sums
    evaluated in double with the same IEEE op sequence as the oracle (raw
    double stddev would drift by engine-dependent summation order)."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum(dec("value")).cast("double").alias("_s"),
        F.sum(dec("value", 12, 2) * dec("value", 12, 2))
        .cast("double")
        .alias("_s2"),
        F.count(F.lit(1)).alias("n"),
    )
    n = F.col("n").cast("double")
    avg = F.col("_s") / n
    var = (F.col("_s2") - (F.col("_s") * F.col("_s")) / n) / (n - F.lit(1.0))
    return agg.select(
        "event_type",
        "min_value",
        "max_value",
        avg.alias("avg_value"),
        F.sqrt(var).alias("stddev_value"),
        "n",
    ).orderBy("event_type")


AGG_STATS_SQL = """
WITH g AS (
  SELECT event_type,
         MIN(value) AS min_value,
         MAX(value) AS max_value,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s,
         CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
              AS DOUBLE) AS s2,
         COUNT(*) AS n
  FROM events GROUP BY event_type
)
SELECT event_type, min_value, max_value,
       s / CAST(n AS DOUBLE) AS avg_value,
       SQRT((s2 - (s * s) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
         AS stddev_value,
       n
FROM g
ORDER BY event_type
"""


def rollup_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with sentinel-coalesced levels (priority → priority+status)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice"), "revenue"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias(
                "priority"
            ),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "n_orders",
            "revenue",
        )
        .orderBy("priority", "status")
    )


ROLLUP_SQL = """
SELECT
  COALESCE(o_orderpriority, 'ALL') AS priority,
  COALESCE(o_orderstatus, 'ALL') AS status,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY priority, status
"""


def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(dec("l_quantity"), "sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias(
                "returnflag"
            ),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias(
                "linestatus"
            ),
            "n_items",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


CUBE_SQL = """
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""

# --------------------------------------------------------------------------
# Window family: ranked top-k per group, running frames, sessionization.
# --------------------------------------------------------------------------


def window_topk_orders_per_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_priority", F.row_number().over(w))
        .filter(F.col("rank_in_priority") <= 3)
        .select(
            "o_orderpriority", "rank_in_priority", "o_orderkey", "o_totalprice"
        )
    )


WINDOW_TOPK_SQL = """
SELECT o_orderpriority, rank_in_priority, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey)
           AS rank_in_priority
  FROM orders
) WHERE rank_in_priority <= 3
"""


def window_running_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running decimal-exact cumulative sum + lag, per user by event time."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        ev.select(
            "user_id", "event_id", ts_us().alias("ts_us"), "value"
        )
        .withColumn(
            "running_value", F.sum(dec("value")).over(w).cast("double")
        )
        .withColumn("prev_value", F.lag("value").over(wl))
        .withColumn("row_in_user", F.row_number().over(wl))
    )


WINDOW_RUNNING_SQL = """
SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, value,
  CAST(SUM(CAST(value AS DECIMAL(12,2)))
       OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS running_value,
  LAG(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)
    AS prev_value,
  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)
    AS row_in_user
FROM events
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) as lag + cumulative flag sum —
    the batch equivalent of a streaming session window, one shuffle on
    user_id."""
    gap_us = 30 * 60 * 1_000_000
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", ts_us().alias("ts_us"), "value"
    )
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_sess = F.when(
        (F.col("ts_us") - F.lag("ts_us").over(wo)) > gap_us, 1
    ).otherwise(0)
    sess = ev.withColumn("_new", new_sess).withColumn(
        "session_id", F.sum("_new").over(wrun)
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            dsum(dec("value"), "session_value"),
        )
        .orderBy("user_id", "session_id")
    )


SESSIONIZE_SQL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, value FROM events
), flagged AS (
  SELECT *,
    CASE WHEN ts_us - LAG(ts_us) OVER
           (PARTITION BY user_id ORDER BY ts_us, event_id) > 1800000000
         THEN 1 ELSE 0 END AS is_new
  FROM ev
), sessed AS (
  SELECT *,
    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) AS session_end_us,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
FROM sessed
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""

# --------------------------------------------------------------------------
# Sorts / limits / set ops / distinct.
# --------------------------------------------------------------------------


def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


SORT_TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with urgent orders but no low-priority orders."""
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.subtract(low)


SET_EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
"""


def set_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both 1996 and 2000."""
    orders = _t(spark, sf_dir, "orders")

    def year_custs(y: int) -> DataFrame:
        return orders.filter(F.year("o_orderdate") == y).select(
            F.col("o_custkey").alias("custkey")
        )

    return year_custs(1996).intersect(year_custs(2000))


SET_INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 2000
"""


def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
    )


DISTINCT_SQL = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"

# --------------------------------------------------------------------------
# Scalar-function families: strings, dates, JSON.
# --------------------------------------------------------------------------


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("text_len"),
        F.upper("source").alias("source_upper"),
        F.substring("text", 1, 20).alias("snippet"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        F.regexp_extract("text", "^([a-z]+)", 1).alias("first_word"),
        (F.instr("text", "spark") > 0).alias("mentions_spark"),
        F.regexp_replace("text", "[aeiou]", "").alias("devoweled"),
    )


STRING_FUNCS_SQL = """
SELECT doc_id,
       CAST(length(text) AS INT) AS text_len,
       upper(source) AS source_upper,
       substring(text, 1, 20) AS snippet,
       concat_ws('|', lang, source) AS lang_source,
       COALESCE(regexp_extract(text, '^([a-z]+)', 1), '') AS first_word,
       strpos(text, 'spark') > 0 AS mentions_spark,
       regexp_replace(text, '[aeiou]', '', 'g') AS devoweled
FROM documents
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
            F.month("o_orderdate").alias("m"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.dayofmonth("o_orderdate")).alias("first_dom"),
            F.max(F.dayofmonth("o_orderdate")).alias("last_dom"),
        )
        .orderBy("y", "m")
    )


DATE_FUNCS_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS y,
       CAST(quarter(o_orderdate) AS INT) AS q,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       COUNT(*) AS n_orders,
       CAST(MIN(day(o_orderdate)) AS INT) AS first_dom,
       CAST(MAX(day(o_orderdate)) AS INT) AS last_dom
FROM orders
GROUP BY 1, 2, 3, 4
ORDER BY y, m
"""


def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over events.props (SURVEY §2.2 json fns)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )


JSON_FUNCS_SQL = """
SELECT event_type,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
         AS n_distinct_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""

# --------------------------------------------------------------------------
# Tumbling-window aggregation (batch form of the streaming op) —
# pure integer bucket arithmetic so both engines agree exactly.
# --------------------------------------------------------------------------


def tumbling_quarter_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bucket_us = 15 * 60 * 1_000_000
    bucket = (ts_us() - (ts_us() % F.lit(bucket_us))).alias("bucket_start_us")
    return (
        ev.select(bucket, "event_type", "value")
        .groupBy("bucket_start_us", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(dec("value"), "sum_value"),
        )
        .orderBy("bucket_start_us", "event_type")
    )


TUMBLING_SQL = """
SELECT (epoch_ns(ts) // 1000) - ((epoch_ns(ts) // 1000) % 900000000)
         AS bucket_start_us,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY bucket_start_us, event_type
"""

# --------------------------------------------------------------------------
# Parity-shaped routing over the events table: regex validation + key
# derivation + 2-topic fan-out as a union of projections (the reference's
# router, SURVEY §2.1 ops 6, 12, 13, exercised under the oracle).
# --------------------------------------------------------------------------


def parity_event_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    valid = ev.filter(F.col("event_type").rlike("^[a-zA-Z0-9._-]+$"))
    base = valid.select(
        F.col("event_id"),
        F.col("user_id").cast("string").alias("key"),
        F.format_string(
            '{"event_id":%d,"event_type":"%s"}',
            F.col("event_id"),
            F.col("event_type"),
        ).alias("value"),
        F.col("event_type"),
    )
    to_all = base.select(
        F.lit("app_events_all").alias("topic"), "event_id", "key", "value"
    )
    to_specific = base.select(
        F.format_string("app_events.app.%s", F.col("event_type")).alias(
            "topic"
        ),
        "event_id",
        "key",
        "value",
    )
    return to_all.unionByName(to_specific)


PARITY_ROUTING_SQL = """
WITH valid AS (
  SELECT * FROM events WHERE regexp_matches(event_type, '^[a-zA-Z0-9._-]+$')
), base AS (
  SELECT event_id,
         CAST(user_id AS VARCHAR) AS key,
         printf('{"event_id":%d,"event_type":"%s"}', event_id, event_type)
           AS value,
         event_type
  FROM valid
)
SELECT 'app_events_all' AS topic, event_id, key, value FROM base
UNION ALL
SELECT 'app_events.app.' || event_type AS topic, event_id, key, value FROM base
"""

# --------------------------------------------------------------------------
# Subquery shapes: EXISTS (semi), scalar-min-per-group, correlated avg.
# Spark-first: correlated subqueries decorrelate into joins/windows — we
# write the decorrelated plan directly (what Catalyst would produce).
# --------------------------------------------------------------------------


def subquery_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders having ≥1 lineitem shipped >60d after order
    date, counted per priority. EXISTS ⇒ left-semi join."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


SUBQ_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def subquery_min_price_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: parts priced at the minimum within their brand.
    Correlated scalar subquery ⇒ window min (no join, one shuffle)."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        part.withColumn("brand_min", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("brand_min"))
        .select("p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    )


SUBQ_MIN_SQL = """
SELECT p_partkey, p_brand, p_retailprice
FROM part p
WHERE p_retailprice = (
  SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
)
ORDER BY p_partkey
"""


def subquery_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with acctbal above their nation's average — correlated
    aggregate ⇒ broadcast join against the per-nation aggregate.
    avg is exact-decimal / count, evaluated identically in the oracle."""
    cust = _t(spark, sf_dir, "customer")
    nation_avg = cust.groupBy("c_nationkey").agg(
        (
            F.sum(dec("c_acctbal")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("nation_avg")
    )
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal", "nation_avg")
    )


SUBQ_AVG_SQL = """
WITH na AS (
  SELECT c_nationkey,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS nation_avg
  FROM customer GROUP BY c_nationkey
)
SELECT c_custkey, c_nationkey, c_acctbal, nation_avg
FROM customer JOIN na USING (c_nationkey)
WHERE c_acctbal > nation_avg
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between supplier and customer
    nations per year. Two broadcast dim joins + the big orders⋈lineitem
    shuffle."""
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    supplier = F.broadcast(_t(spark, sf_dir, "supplier"))
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    disc = dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(n1, supplier.s_nationkey == F.col("s_nk"))
        .join(n2, cust.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(dec("l_extendedprice") * disc, "volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name != n2.n_name
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year
"""

# --------------------------------------------------------------------------
# GROUPING SETS + extended window analytics + math/array function families
# + approximate distinct.
# --------------------------------------------------------------------------


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (priority), (status) — distinct from
    rollup/cube; expressed via spark.sql on a registered view."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS revenue
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        ORDER BY priority, status
        """
    )


GROUPING_SETS_SQL = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
ORDER BY priority, status
"""


def window_analytics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / lead / ntile / frame-avg in one pass — the
    remaining ranking+analytic window families over a bounded frame."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    wo = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    frame = wo.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(wo).alias("rnk"),
        F.dense_rank().over(wo).alias("drnk"),
        F.lead("o_orderkey").over(wo).alias("next_orderkey"),
        F.ntile(4).over(wo).alias("quartile"),
        (
            F.sum(dec("o_totalprice")).over(frame).cast("double")
            / F.count(F.lit(1)).over(frame).cast("double")
        ).alias("avg_last3"),
    )


WINDOW_ANALYTICS_SQL = """
SELECT o_custkey, o_orderkey,
  RANK() OVER w AS rnk,
  DENSE_RANK() OVER w AS drnk,
  LEAD(o_orderkey) OVER w AS next_orderkey,
  NTILE(4) OVER w AS quartile,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
    / CAST(COUNT(*)
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS avg_last3
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math family over part prices — all IEEE-deterministic ops."""
    part = _t(spark, sf_dir, "part")
    p = F.col("p_retailprice")
    return part.select(
        "p_partkey",
        F.round(p, 1).alias("price_round1"),
        F.abs(p - 1500.0).alias("dist_from_1500"),
        F.ceil(p).cast("long").alias("price_ceil"),
        F.floor(p).cast("long").alias("price_floor"),
        F.sqrt(p).alias("price_sqrt"),
        F.log(p).alias("price_ln"),
        F.pow(F.col("p_size").cast("double"), F.lit(2.0)).alias("size_sq"),
        (F.col("p_partkey") % 7).cast("long").alias("key_mod7"),
        F.signum(p - 1500.0).alias("sign_vs_1500"),
    )


MATH_FUNCS_SQL = """
SELECT p_partkey,
       ROUND(p_retailprice, 1) AS price_round1,
       ABS(p_retailprice - 1500.0) AS dist_from_1500,
       CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
       SQRT(p_retailprice) AS price_sqrt,
       LN(p_retailprice) AS price_ln,
       POW(CAST(p_size AS DOUBLE), 2.0) AS size_sq,
       CAST(p_partkey % 7 AS BIGINT) AS key_mod7,
       CASE WHEN p_retailprice - 1500.0 > 0 THEN 1.0
            WHEN p_retailprice - 1500.0 < 0 THEN -1.0 ELSE 0.0 END
         AS sign_vs_1500
FROM part
"""


def math_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trig/exponential/log family, oracle-gated by engine-local libm
    identities: sin/cos/tan/exp/ln/log10/pow/cbrt/asin/acos/atan results
    differ between engines in final ulps (libm is not cross-platform
    bit-stable), so each engine verifies its OWN outputs against exact
    mathematical identities and emits only booleans — which must match.
    The tan/atan checks guard the poles (|cos t| small) where identity
    evaluation is ill-conditioned."""
    import math

    part = _t(spark, sf_dir, "part")
    deg = (F.col("p_partkey") % 360).cast("double")
    t = deg * F.lit(math.pi) / F.lit(180.0)
    x = F.col("p_retailprice").cast("double") / F.lit(1000.0)
    u = (F.col("p_partkey") % 200).cast("double") / F.lit(100.0) - F.lit(1.0)

    def ok(expr):
        return F.abs(expr) < F.lit(1e-9)

    sin_t, cos_t = F.sin(t), F.cos(t)
    return part.select(
        "p_partkey",
        ok(sin_t * sin_t + cos_t * cos_t - F.lit(1.0)).alias("pyth_ok"),
        ok(F.sin(t * 2) - sin_t * cos_t * 2).alias("double_angle_ok"),
        F.when(F.abs(cos_t) > 0.1, ok(F.tan(t) - sin_t / cos_t))
        .otherwise(F.lit(True))
        .alias("tan_ok"),
        ok(F.log(F.exp(x)) - x).alias("exp_ln_ok"),
        ok(F.log10(F.pow(F.lit(10.0), x / 10)) - x / 10).alias(
            "log10_pow_ok"
        ),
        ok(F.sin(F.asin(u)) - u).alias("asin_ok"),
        ok(F.cos(F.acos(u)) - u).alias("acos_ok"),
        ok(F.cbrt(x * x * x) - x).alias("cbrt_ok"),
        ok(F.degrees(F.radians(deg)) - deg).alias("deg_rad_ok"),
        ok(F.atan(F.tan(t / 4)) - t / 4).alias("atan_ok"),
    )


MATH_FUNCS_2_SQL = """
WITH b AS (
  SELECT p_partkey,
         CAST(p_partkey % 360 AS DOUBLE) AS deg,
         CAST(p_partkey % 360 AS DOUBLE) * pi() / 180.0 AS t,
         CAST(p_retailprice AS DOUBLE) / 1000.0 AS x,
         CAST(p_partkey % 200 AS DOUBLE) / 100.0 - 1.0 AS u
  FROM part
)
SELECT p_partkey,
  ABS(SIN(t)*SIN(t) + COS(t)*COS(t) - 1.0) < 1e-9 AS pyth_ok,
  ABS(SIN(t*2) - SIN(t)*COS(t)*2) < 1e-9 AS double_angle_ok,
  CASE WHEN ABS(COS(t)) > 0.1
       THEN ABS(TAN(t) - SIN(t)/COS(t)) < 1e-9
       ELSE TRUE END AS tan_ok,
  ABS(LN(EXP(x)) - x) < 1e-9 AS exp_ln_ok,
  ABS(LOG10(POW(10.0, x/10)) - x/10) < 1e-9 AS log10_pow_ok,
  ABS(SIN(ASIN(u)) - u) < 1e-9 AS asin_ok,
  ABS(COS(ACOS(u)) - u) < 1e-9 AS acos_ok,
  ABS(CBRT(x*x*x) - x) < 1e-9 AS cbrt_ok,
  ABS(DEGREES(RADIANS(deg)) - deg) < 1e-9 AS deg_rad_ok,
  ABS(ATAN(TAN(t/4)) - t/4) < 1e-9 AS atan_ok
FROM b
"""


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over embeddings: size/slice/contains-style ops with
    integer outputs (deterministic; float reductions live in the cosine
    queries)."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        F.size(F.filter(e, lambda x: x < 0)).alias("n_negative"),
        F.round(F.element_at(e, 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(
                F.slice(e, 1, 8),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            ),
            6,
        ).alias("head8_sum"),
        ((F.col("label") % 2) == 0).alias("label_even"),
    )


ARRAY_FUNCS_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
       CAST(len(list_filter(embedding, x -> x < 0)) AS INT) AS n_negative,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
       ROUND(list_sum(list_transform(embedding[1:8],
                                     x -> CAST(x AS DOUBLE))), 6)
         AS head8_sum,
       (label % 2) = 0 AS label_even
FROM embeddings
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate, oracle-gated by an engine-local
    invariant: each engine computes its OWN approx estimate (the raw
    estimates differ by construction — Spark HLL++ vs DuckDB HLL) and
    emits only the exact count plus a within-5% boolean, which must agree.
    """
    ev = _t(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", 0.01)
    exact = F.countDistinct("user_id")
    return (
        ev.groupBy("event_type")
        .agg(
            exact.alias("exact_users"),
            (
                F.abs(approx.cast("double") - exact.cast("double"))
                / exact.cast("double")
                <= F.lit(0.05)
            ).alias("approx_within_5pct"),
        )
        .orderBy("event_type")
    )


AGG_APPROX_DISTINCT_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       ABS(CAST(approx_count_distinct(user_id) AS DOUBLE)
           - CAST(COUNT(DISTINCT user_id) AS DOUBLE))
         / CAST(COUNT(DISTINCT user_id) AS DOUBLE) <= 0.05
         AS approx_within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles, invariant-gated: the exact interpolated
    p50/p90 must hash-match across engines; each engine's own quantile
    sketch (Spark KLL-style approx_percentile, DuckDB t-digest) must land
    within 5% of its exact value — booleans pinned TRUE by the oracle."""
    ev = _t(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    ex50 = F.percentile(v, F.lit(0.5))
    ex90 = F.percentile(v, F.lit(0.9))
    ap50 = F.approx_percentile(v, F.lit(0.5), F.lit(10000))
    ap90 = F.approx_percentile(v, F.lit(0.9), F.lit(10000))

    def close(approx, exact):
        return F.abs(approx - exact) <= 0.05 * (F.abs(exact) + F.lit(1.0))

    return (
        ev.groupBy("event_type")
        .agg(
            F.round(ex50, 6).alias("p50_exact"),
            F.round(ex90, 6).alias("p90_exact"),
            close(ap50, ex50).alias("p50_close"),
            close(ap90, ex90).alias("p90_close"),
        )
        .orderBy("event_type")
    )


AGG_APPROX_PCTL_SQL = """
SELECT event_type,
  ROUND(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50_exact,
  ROUND(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90_exact,
  ABS(approx_quantile(CAST(value AS DOUBLE), 0.5)
      - quantile_cont(CAST(value AS DOUBLE), 0.5))
    <= 0.05 * (ABS(quantile_cont(CAST(value AS DOUBLE), 0.5)) + 1.0)
    AS p50_close,
  ABS(approx_quantile(CAST(value AS DOUBLE), 0.9)
      - quantile_cont(CAST(value AS DOUBLE), 0.9))
    <= 0.05 * (ABS(quantile_cont(CAST(value AS DOUBLE), 0.9)) + 1.0)
    AS p90_close
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches HLL surface (hll_sketch_agg → hll_union_agg →
    hll_sketch_estimate): per-segment sketches are MERGED up to
    event_type — the distributed pattern where executors sketch locally
    and only sketch bytes travel. Invariant-gated: the merged estimate
    must land within 5% of the exact distinct count (DuckDB checks its
    own HLL the same way)."""
    ev = _t(spark, sf_dir, "events")
    seg_sketches = ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("_seg")
    ).agg(F.hll_sketch_agg("user_id").alias("_sk"))
    merged = seg_sketches.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        exact.join(merged, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(
                    F.col("_est").cast("double")
                    - F.col("exact_users").cast("double")
                )
                / F.col("exact_users").cast("double")
                <= 0.05
            ).alias("merged_within_5pct"),
        )
        .orderBy("event_type")
    )


AGG_HLL_SKETCH_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       ABS(CAST(approx_count_distinct(user_id) AS DOUBLE)
           - CAST(COUNT(DISTINCT user_id) AS DOUBLE))
         / CAST(COUNT(DISTINCT user_id) AS DOUBLE) <= 0.05
         AS merged_within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "join_outer_order_counts": join_outer_order_counts,
    "join_semi_big_spenders": join_semi_big_spenders,
    "join_anti_no_urgent": join_anti_no_urgent,
    "join_range_price_bands": join_range_price_bands,
    "join_range_binned": join_range_binned,
    "join_asof_purchase_click": join_asof_purchase_click,
    "agg_distinct_users": agg_distinct_users,
    "agg_value_stats": agg_value_stats,
    "rollup_order_revenue": rollup_order_revenue,
    "cube_lineitem_flags": cube_lineitem_flags,
    "window_topk_orders_per_priority": window_topk_orders_per_priority,
    "window_running_user_spend": window_running_user_spend,
    "sessionize_events": sessionize_events,
    "sort_topk_orders": sort_topk_orders,
    "set_except_customers": set_except_customers,
    "set_intersect_customers": set_intersect_customers,
    "distinct_segments": distinct_segments,
    "string_functions": string_functions,
    "date_functions": date_functions,
    "json_functions": json_functions,
    "tumbling_quarter_hour": tumbling_quarter_hour,
    "parity_event_routing": parity_event_routing,
    "subquery_exists_late_orders": subquery_exists_late_orders,
    "subquery_min_price_part": subquery_min_price_part,
    "subquery_above_nation_avg": subquery_above_nation_avg,
    "q7_nation_volume": q7_nation_volume,
    "grouping_sets_revenue": grouping_sets_revenue,
    "window_analytics_suite": window_analytics_suite,
    "math_functions": math_functions,
    "math_functions_2": math_functions_2,
    "array_functions": array_functions,
    "agg_approx_distinct": agg_approx_distinct,
    "agg_approx_percentile": agg_approx_percentile,
    "agg_hll_sketch_union": agg_hll_sketch_union,
}

ORACLE_SQL: dict[str, str] = {
    "subquery_exists_late_orders": SUBQ_EXISTS_SQL,
    # (extension-module entries merged below)
    "subquery_min_price_part": SUBQ_MIN_SQL,
    "subquery_above_nation_avg": SUBQ_AVG_SQL,
    "q7_nation_volume": Q7_SQL,
    "grouping_sets_revenue": GROUPING_SETS_SQL,
    "window_analytics_suite": WINDOW_ANALYTICS_SQL,
    "math_functions": MATH_FUNCS_SQL,
    "math_functions_2": MATH_FUNCS_2_SQL,
    "array_functions": ARRAY_FUNCS_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "join_outer_order_counts": JOIN_OUTER_SQL,
    "join_semi_big_spenders": JOIN_SEMI_SQL,
    "join_anti_no_urgent": JOIN_ANTI_SQL,
    "join_range_price_bands": JOIN_RANGE_SQL,
    "join_range_binned": JOIN_RANGE_BINNED_SQL,
    "join_asof_purchase_click": JOIN_ASOF_SQL,
    "agg_distinct_users": AGG_DISTINCT_SQL,
    "agg_approx_distinct": AGG_APPROX_DISTINCT_SQL,
    "agg_approx_percentile": AGG_APPROX_PCTL_SQL,
    "agg_hll_sketch_union": AGG_HLL_SKETCH_SQL,
    "agg_value_stats": AGG_STATS_SQL,
    "rollup_order_revenue": ROLLUP_SQL,
    "cube_lineitem_flags": CUBE_SQL,
    "window_topk_orders_per_priority": WINDOW_TOPK_SQL,
    "window_running_user_spend": WINDOW_RUNNING_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "sort_topk_orders": SORT_TOPK_SQL,
    "set_except_customers": SET_EXCEPT_SQL,
    "set_intersect_customers": SET_INTERSECT_SQL,
    "distinct_segments": DISTINCT_SQL,
    "string_functions": STRING_FUNCS_SQL,
    "date_functions": DATE_FUNCS_SQL,
    "json_functions": JSON_FUNCS_SQL,
    "tumbling_quarter_hour": TUMBLING_SQL,
    "parity_event_routing": PARITY_ROUTING_SQL,
}

# Merge the part-2 surface (TPC-H remainder + extra scalar families) so the
# driver contract, tests, and bench all see one registry. Imported last so
# analytics_ext can reuse this module's helpers without a cycle.
from near_event_streams_spark.plans import analytics_ext as _ext  # noqa: E402

QUERIES.update(_ext.QUERIES)
ORACLE_SQL.update(_ext.ORACLE_SQL)
