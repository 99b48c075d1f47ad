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


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bin_width: int,
) -> DataFrame:
    """Interval×interval OVERLAP join (``a.start <= b.end AND
    b.start <= a.end``, closed intervals) — the join Spark has no native
    operator for, in its large-large scale shape.

    Both sides explode onto the fixed-width bins their interval covers
    and equi-join on the bin key; the exact overlap predicate then
    discards bin-boundary false positives. A pair of overlapping
    intervals meets in EVERY shared bin, so each pair is emitted only
    from its FIRST shared bin — ``_bin == greatest(start_bin_a,
    start_bin_b)``, which both sides necessarily cover when they
    overlap. That keeps the output exactly the naive theta join's bag
    (duplicate input rows keep their multiplicity) with no distinct()
    full-width shuffle. Cost: fan-out is Σ ⌈len/bin_width⌉ + 1 per
    side — choose ``bin_width`` near the median interval length and it
    stays O(rows); the join itself is an ordinary shuffle hash/merge
    join, parallel and AQE-skew-handled. A nested-loop would be
    O(|a|·|b|) and is plan-gated away.

    Columns must be pre-disambiguated (no shared names beyond none).
    """
    def start_bin(lo: str):
        return F.floor(F.col(lo) / F.lit(bin_width)).cast("long")

    def bins(lo: str, hi: str):
        return F.sequence(
            start_bin(lo),
            F.floor(F.col(hi) / F.lit(bin_width)).cast("long"),
        )

    ab = a.withColumn("_bin", F.explode(bins(a_start, a_end)))
    bb = b.withColumn("_bin", F.explode(bins(b_start, b_end)))
    return (
        ab.join(bb, "_bin")
        .filter(
            (F.col(a_start) <= F.col(b_end))
            & (F.col(b_start) <= F.col(a_end))
            & (
                F.col("_bin")
                == F.greatest(start_bin(a_start), start_bin(b_start))
            )
        )
        .drop("_bin")
    )
