"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting (on by default in session.py) handles most
runtime skew; these explicit forms are for the two cases AQE can't fix:

* **aggregation skew** — a single hot group key (one contract emitting
  90% of events) funnels into one reduce task. ``salted_aggregate``
  splits each group into ``salt`` subgroups (deterministic hash of a
  spread column, or random), partially aggregates, then merges — the hot
  key's work fans across ``salt`` tasks and the merge input is tiny.
* **broadcast-impossible hot-key joins** — ``salted_join`` replicates the
  small side ``salt`` times and salts the big side's key, so one hot
  join key spreads over ``salt`` shuffle partitions. Use only when the
  small side is too big to broadcast AND AQE's split is insufficient
  (e.g. a single key larger than an executor).

Both are semantics-preserving: results equal the unsalted forms (tested
in tests/test_skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from near_event_streams_spark.functions.rounding import half_up6_spark


def _salt_col(df: DataFrame, salt: int, spread_col: str | None) -> Column:
    """Deterministic salt when a spread column is given (reproducible
    plans, no RNG in tests); random otherwise."""
    if spread_col is not None:
        return F.pmod(F.xxhash64(F.col(spread_col)), F.lit(salt))
    return (F.rand(seed=42) * salt).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count: bool = True,
    salt: int = 16,
    spread_col: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation: count and/or sums per key.

    Phase 1 groups on (keys + salt) — the hot key's rows split across
    ``salt`` reduce tasks; phase 2 merges the ≤ salt partial rows per key.
    """
    salted = df.withColumn("_salt", _salt_col(df, salt, spread_col))
    partial_aggs = [F.count(F.lit(1)).alias("_cnt")] if count else []
    partial_aggs += [F.sum(c).alias(f"_sum_{c}") for c in sum_cols]
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = []
    if count:
        final_aggs.append(F.sum("_cnt").alias("n"))
    final_aggs += [F.sum(f"_sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-safe equi-join: replicate ``small`` across ``salt`` ids,
    salt ``big``'s key randomly, join on (key, salt). Join semantics are
    preserved for inner/left joins on a unique-keyed small side."""
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt - 1))
    ).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "_salt", (F.rand(seed=7) * salt).cast("int")
    )
    return big_salted.join(small_rep, [key, "_salt"], how).drop("_salt")


def key_skew_profile(
    df: DataFrame, key: str, top_k: int = 10
) -> DataFrame:
    """Skew diagnostic for a join/agg key: the ``top_k`` heaviest keys
    with their row share and cumulative share, against the key-space
    totals — the report you read before deciding whether a key needs
    salting (``salted_aggregate``/``salted_join``) or AQE skew-join
    hints. A key whose share dwarfs 1/parallelism is the straggler.

    Returns ``(rank, key, cnt, n_rows, n_keys, share_pct, cum_share_pct)``.

    Plan shape at 100 TB: ONE count aggregate on the key (map-side
    partial collapses per-task duplicates), PERSISTED because both the
    scalar totals and the top-k consume it and Catalyst does not dedupe
    the shared subtree (measured zero ReusedExchange — without the
    persist the input is scanned and aggregated twice); then a
    TakeOrdered for the top-k and one broadcast scalar total — the
    ranking/cumsum window runs over the k selected rows only, never
    the key space. Persist handle is caller-owned (clearCache).
    """
    counts = (
        df.groupBy(F.col(key).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    totals = F.broadcast(
        counts.agg(
            F.sum("cnt").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
        )
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_k)
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))  # k rows, bounded
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_cnt",
            F.sum("cnt").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .crossJoin(totals)
        .select(
            "rank",
            "key",
            "cnt",
            "n_rows",
            "n_keys",
            # HALF_UP 6dp via exact integer arithmetic
            # (functions/rounding.half_up6_*): ROUND on a double quotient
            # tie-breaks differently across engines on 2^i·5^j counts.
            F.expr(half_up6_spark("cnt*100", "n_rows")).alias(
                "share_pct"
            ),
            F.expr(half_up6_spark("cum_cnt*100", "n_rows")).alias(
                "cum_share_pct"
            ),
        )
        .orderBy("rank")
    )
