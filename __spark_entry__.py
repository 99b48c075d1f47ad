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

from near_event_streams_spark.plans import (  # noqa: E402
    analytics,
    curation,
    llm_ops,
    timeseries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-shape pricing summary on sf0.001."""
    return analytics.q1_pricing_summary(spark, "/root/testdata/sf0.001")


#: A once-red query stops sorting first after this many driver-green
#: checks in rounds AFTER its last red one — it then rejoins the
#: normal staleness rotation instead of pinning a scoreboard slot
#: forever (r10 verdict: 8 long-green queries were re-spending 16%
#: of the 50-row driver window every round).
GRADUATION_GREENS = 2


def _driver_history() -> tuple[dict[str, int], dict[str, int], set[str]]:
    """Scan past driver scoreboards: (times checked, last round
    checked, red/errored-and-not-yet-graduated).

    The external correctness driver may check only a prefix of the
    registry (round 1 stopped at 50 of 90), so ordering decides which
    queries get gated. Three goals, in priority order: (1) any query
    that was red or errored in a driver round must be re-verified
    first — otherwise a fix's status rests only on the local harness —
    but only until it has ``GRADUATION_GREENS`` driver-green checks in
    LATER rounds than its last red, after which it graduates back into
    the rotation; (2) rotate toward the STALEST cohort (least-recently
    -checked — the code under a query refactors between rounds, so
    recency of the last check matters more than how often it ever
    ran); (3) break recency ties by fewest total checks, then name for
    determinism.
    """
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    counts: dict[str, int] = {}
    last_round: dict[str, int] = {}
    last_bad: dict[str, int] = {}
    green_rounds: dict[str, list[int]] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            counts[name] = counts.get(name, 0) + 1
            last_round[name] = max(last_round.get(name, 0), rnd)
            bad = isinstance(row, dict) and (
                row.get("err") is not None
                or any(
                    row.get(k) is False
                    for k in ("rows_match", "schema_match", "hash_match")
                )
            )
            if bad:
                last_bad[name] = max(last_bad.get(name, 0), rnd)
            else:
                green_rounds.setdefault(name, []).append(rnd)
    needs_recheck: set[str] = set()
    for name, bad_rnd in last_bad.items():
        greens_after = sum(
            1 for r in green_rounds.get(name, []) if r > bad_rnd
        )
        if greens_after < GRADUATION_GREENS:
            needs_recheck.add(name)
    return counts, last_round, needs_recheck


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(analytics.QUERIES)
    out.update(llm_ops.QUERIES)
    out.update(curation.QUERIES)
    out.update(timeseries.QUERIES)
    counts, last_round, ever_bad = _driver_history()
    ordered = sorted(
        out,
        key=lambda name: (
            name not in ever_bad,
            last_round.get(name, 0),
            counts.get(name, 0),
            name,
        ),
    )
    return {name: out[name] for name in ordered}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(analytics.ORACLE_SQL)
    out.update(llm_ops.ORACLE_SQL)
    out.update(curation.ORACLE_SQL)
    out.update(timeseries.ORACLE_SQL)
    return out
