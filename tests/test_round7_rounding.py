"""Round-7 exact-rounding regression suite.

The r6 driver red (`rfm_customer_segments`) was a round-half tie:
68570553.99/32 = 2142829.8121875 exactly — Spark's ROUND on the decimal
quotient rounds the tie HALF_UP while DuckDB promotes decimal division
to DOUBLE and rounds the binary value (2142829.81218749997…) down. The
fix class: round in exact integer/decimal arithmetic on BOTH engines
(`plans/_common.half_up6_spark` / `half_up6_duck`). These tests pin the
tie cell and the helper parity so the class cannot regress silently.
"""

import duckdb

from near_event_streams_spark.plans._common import (
    half_up6_duck,
    half_up6_spark,
)


def test_half_up6_helpers_agree_on_ties(spark):
    """Adversarial numerator/denominator pairs, every one a 6dp
    half-tie or near-tie whose double rendering disagrees between
    binary-round and shortest-decimal-round."""
    cases = [
        # (num, den) — num/den
        (6857055399, 3200),  # the r6 red: /100 scale folded in
        (1, 2000000),        # 5e-7: tie at the 6th decimal, inexact
        (3, 2000000),        # 1.5e-6
        (1, 128),            # dyadic 7-digit tie (exact double)
        (12345679, 2000000), # 6.1728395 → tie digit deep
        (7, 16),             # terminates before 6dp — no-op round
        (1, 3),              # non-terminating
        (999999999999, 1024),
    ]
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(cases, "num long, den long").select(
        "num",
        "den",
        F.expr(half_up6_spark("num", "den")).alias("q"),
    )
    got = {(r["num"], r["den"]): r["q"] for r in sdf.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (num BIGINT, den BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            f"SELECT num, den, {half_up6_duck('num', 'den')} FROM t"
        ).fetchall()
    }
    assert got == want, (got, want)
    # and the canonical tie rounds UP (HALF_UP), not to the binary
    # neighbor below
    assert got[(6857055399, 3200)] == 2142829.812188


def test_rfm_tie_cell_matches_oracle_exactly(spark):
    """The (2,1,2) segment that shipped red in r6: n=32 customers,
    exact mean 2142829.8121875 — both engines must now emit the
    HALF_UP value 2142829.812188 bit-for-bit."""
    from near_event_streams_spark.plans.analytics_ext import (
        RFM_SQL,
        rfm_customer_segments,
    )
    from tests.oracle import compare, duck_connection

    sf = "/root/testdata/sf0.01"
    df = rfm_customer_segments(spark, sf)
    cell = [
        r
        for r in df.collect()
        if (r.seg_recency, r.seg_frequency, r.seg_monetary) == (2, 1, 2)
    ]
    assert cell and cell[0]["n_customers"] == 32
    assert cell[0]["avg_monetary"] == 2142829.812188
    con = duck_connection(sf)
    try:
        compare(df, con, RFM_SQL, name="rfm_customer_segments")
    finally:
        con.close()


def test_oracle_canonicalizer_matches_driver_resolution():
    """%.15g must distinguish the 13th-digit class that %.12g collapsed
    (the r6 process bug: local gate green, driver red) while tolerating
    the one-ulp libm class the driver provably accepts
    (math_functions, green in driver r1+r4)."""
    from tests.oracle import _canon_value

    a, b = 2142829.812188, 2142829.8121874998
    assert _canon_value(a) != _canon_value(b)
    assert f"{a:.12g}" == f"{b:.12g}"  # the old mask, kept as proof
    # one-ulp ln() divergence between JVM and DuckDB libm: tolerated
    c, d = 6.9021395401965009, 6.9021395401965018
    assert _canon_value(c) == _canon_value(d)


def test_half_up_signed_helpers_agree_on_ties(spark):
    """Signed variant: negative ties must round AWAY FROM ZERO on both
    engines (Spark HALF_UP == DuckDB decimal-style half-away), and the
    digits/num_scale parameters must agree."""
    from pyspark.sql import functions as F

    from near_event_streams_spark.plans._common import (
        half_up_signed_duck,
        half_up_signed_spark,
    )

    cases = [
        (-6857055399, 3200),   # the r6 tie, negated: -2142829.8121875
        (6857055399, 3200),
        (-1, 2000000),         # -5e-7 → -0.000001
        (-3, 2000000),
        (1, 3),
        (-999999999999, 1024),
    ]
    sdf = spark.createDataFrame(cases, "num long, den long").select(
        "num",
        "den",
        F.expr(half_up_signed_spark("num", "den", 6, 1)).alias("q6"),
        F.expr(half_up_signed_spark("num*100", "den", 9, 100)).alias(
            "q9"
        ),
    )
    got = {(r["num"], r["den"]): (r["q6"], r["q9"]) for r in sdf.collect()}

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (num BIGINT, den BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            f"SELECT num, den, "
            f"{half_up_signed_duck('num', 'den', 6, 1)}, "
            f"{half_up_signed_duck('num*100', 'den', 9, 100)} FROM t"
        ).fetchall()
    }
    assert got == want, (got, want)
    assert got[(-6857055399, 3200)][0] == -2142829.812188  # away from 0
    assert got[(-1, 2000000)][0] == -0.000001
