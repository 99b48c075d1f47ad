"""Binned range join — the large-large scale path for interval joins.

A range (theta) join ``facts.value ∈ [bands.lo, bands.hi)`` has exactly
two good physical shapes:

* band table tiny → ``BroadcastNestedLoopJoin`` (what
  ``plans/analytics.py:join_range_price_bands`` does) — each fact row
  scans a handful of broadcast bands; right at any fact scale.
* band table LARGE (millions of intervals — IP ranges, time slices,
  geo cells) → NLJ is O(facts × bands) and unusable. The standard fix is
  BINNING: quantize the value domain into fixed-width bins, explode each
  band onto every bin it overlaps, tag each fact with its single bin,
  equi-join on the bin key (ordinary shuffle hash/merge join — parallel,
  skew-handled by AQE), then re-check the exact predicate to discard
  the bin-boundary false positives.

Cost model: band-side fan-out = Σ ⌈(hi−lo)/bin_width⌉ rows; fact side is
narrow (one bin per row). Choose ``bin_width`` near the median band
width so fan-out stays O(bands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 500.0,
) -> DataFrame:
    """Join ``facts`` to half-open intervals ``[lo, hi)`` via bin
    equi-join + residual predicate. Output rows equal the naive theta
    join; only the physical plan changes (no nested loop, no cartesian —
    plan-gated in tests/test_plan_quality.py). Requires finite ``hi``.
    """
    fact_bin = F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    band_bins = F.sequence(
        F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
        F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
    )
    fb = facts.withColumn("_bin", fact_bin)
    bb = bands.withColumn("_bin", F.explode(band_bins))
    return (
        fb.join(bb, "_bin")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_bin")
    )
