"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator/query (SURVEY §2) as
``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — matching DuckDB SQL for the oracle-gated subset;
hash-based approximate operators (MinHash-LSH, SimHash, hyperplane-LSH)
are intentionally rows-only — their exact counterparts gate the semantics.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from near_event_streams_spark.plans import analytics, llm_ops  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-shape pricing summary on sf0.001."""
    return analytics.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(analytics.QUERIES)
    out.update(llm_ops.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(analytics.ORACLE_SQL)
    out.update(llm_ops.ORACLE_SQL)
    return out
