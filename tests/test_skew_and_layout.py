"""Salting operators preserve semantics; partitioned sink produces a
prunable layout."""

import os

from pyspark.sql import functions as F

from near_event_streams_spark.operators import skew
from near_event_streams_spark.sinks.parquet_sink import write_partitioned
from near_event_streams_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _events(spark):
    return load_table(spark, SF_DIR, "events")


def test_salted_aggregate_matches_plain(spark):
    ev = _events(spark)
    plain = {
        (r["event_type"], r["n"], round(r["sum_value"], 6))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .collect()
    }
    # deterministic spread on event_id; float sums re-rounded (salting
    # legitimately changes double summation order)
    salted = {
        (r["event_type"], r["n"], round(r["sum_value"], 6))
        for r in skew.salted_aggregate(
            ev,
            ["event_type"],
            sum_cols=["value"],
            salt=8,
            spread_col="event_id",
        ).collect()
    }
    assert {(t, n) for t, n, _ in plain} == {(t, n) for t, n, _ in salted}
    # sums agree to float tolerance
    ps = {t: s for t, _, s in plain}
    ss = {t: s for t, _, s in salted}
    for t in ps:
        assert abs(ps[t] - ss[t]) < 1e-3, (t, ps[t], ss[t])


def test_salted_join_matches_plain(spark):
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    salted = (
        skew.salted_join(orders, cust, "o_custkey", salt=8)
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_write_partitioned_layout_and_roundtrip(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_tbl")
    write_partitioned(
        orders,
        out,
        partition_by=["order_year"],
        sort_within=["o_custkey"],
        max_records_per_file=100_000,
    )
    # hive-style partition dirs exist
    years = {
        d for d in os.listdir(out) if d.startswith("order_year=")
    }
    assert len(years) >= 3, years
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # partition pruning: a year-filtered scan must read only that dir
    one_year = back.filter(F.col("order_year") == 1996)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert "order_year" in plan
    assert one_year.count() == orders.filter(F.year("o_orderdate") == 1996).count()
