"""Oracle-compare every analytics query at sf0.001 (fast) — the same
check the driver runs at sf0.01."""

import pytest

from near_event_streams_spark.plans.analytics import ORACLE_SQL, QUERIES
from tests.conftest import SF_DIR
from tests.oracle import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_harness_rejects_hugeint_oracle(spark, duck):
    """The driver's value hash is type-sensitive: DuckDB HUGEINT never
    matches a Spark BIGINT even at equal values (the round-4
    layout_zorder_locality red). The local harness must fail the same
    way, BEFORE value comparison, so the gate catches it pre-driver."""
    df = spark.range(1).selectExpr("CAST(42 AS BIGINT) AS v")
    # list_sum over BIGINT infers HUGEINT in DuckDB — the exact shape
    # that shipped the round-4 bug.
    hugeint_sql = "SELECT list_sum([CAST(42 AS BIGINT)]) AS v"
    with pytest.raises(AssertionError, match="HUGEINT"):
        compare(df, duck, hugeint_sql, name="hugeint_regression")
    # and the cast fix must pass
    compare(
        df,
        duck,
        "SELECT CAST(list_sum([CAST(42 AS BIGINT)]) AS BIGINT) AS v",
        name="hugeint_cast_ok",
    )


def test_harness_rejects_float_vs_double(spark, duck):
    df = spark.range(1).selectExpr("CAST(1.5 AS DOUBLE) AS v")
    with pytest.raises(AssertionError, match="double"):
        compare(
            df, duck, "SELECT CAST(1.5 AS REAL) AS v", name="float_reg"
        )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLE_SQL:
        compare(df, duck, ORACLE_SQL[name], name=name)
    else:
        # rows-only entries (approximate ops) must at least run
        assert df.count() >= 0


def test_interval_overlap_matches_naive_theta_join(spark):
    """Bin-join + residual predicate must return exactly the naive
    overlap theta-join's pairs, bin boundaries and multi-bin meetings
    included."""
    from pyspark.sql import functions as F

    from near_event_streams_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    # a_id=3 appears TWICE: bag semantics must keep both copies (the
    # old full-row distinct() collapsed legitimately duplicate inputs)
    a = spark.createDataFrame(
        [(1, 0, 10), (2, 15, 25), (3, 100, 200), (4, 30, 30),
         (3, 100, 200)],
        "a_id long, s long, e long",
    )
    b = spark.createDataFrame(
        [(10, 5, 15), (20, 25, 29), (30, 150, 160), (40, 30, 31),
         (50, 300, 400)],
        "b_id long, ws long, we long",
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b, "s", "e", "ws", "we", bin_width=7
        ).collect()
    )
    naive = sorted(
        (r["a_id"], r["b_id"])
        for r in a.join(
            b, (F.col("s") <= F.col("we")) & (F.col("ws") <= F.col("e"))
        ).collect()
    )
    assert got == naive and (1, 10) in got and (4, 40) in got
    assert got.count((3, 30)) == 2


def test_interval_overlap_randomized_equivalence(spark):
    """Randomized property: for arbitrary interval sets and bin widths,
    bin-join + residual == naive theta join (seeded, deterministic)."""
    import random

    from pyspark.sql import functions as F

    from near_event_streams_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    rng = random.Random(20260814)
    for trial in range(3):
        mk = lambda n, span: [
            (i, s, s + rng.randint(0, span))
            for i, s in enumerate(
                rng.randint(0, 1000) for _ in range(n)
            )
        ]
        a = spark.createDataFrame(mk(40, 60), "a_id long, s long, e long")
        b = spark.createDataFrame(mk(40, 15), "b_id long, ws long, we long")
        width = rng.choice([3, 17, 64])
        got = sorted(
            (r["a_id"], r["b_id"])
            for r in interval_overlap_join(
                a, b, "s", "e", "ws", "we", bin_width=width
            ).collect()
        )
        naive = sorted(
            (r["a_id"], r["b_id"])
            for r in a.join(
                b,
                (F.col("s") <= F.col("we")) & (F.col("ws") <= F.col("e")),
            ).collect()
        )
        assert got == naive, (trial, width, len(got), len(naive))
