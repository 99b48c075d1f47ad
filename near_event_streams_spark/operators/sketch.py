"""Count-min sketch: sublinear frequency estimation over token streams.

Complements the cardinality sketches already in the registry
(``approx_count_distinct``, ``hll_sketch_agg``) with the FREQUENCY
sketch a corpus pipeline uses for heavy-hitter detection when the exact
vocabulary doesn't fit anywhere: the sketch is a fixed ``d x w`` counter
table (kilobytes), built in one pass, mergeable across partitions by
cell-wise addition — exactly the partial-aggregation shape Spark's hash
aggregate already gives a ``groupBy`` on the cell key.

Scale: the input stream never shuffles on the token — only on the
``(row, col)`` cell key whose cardinality is capped at ``d*w`` — and the
finished sketch broadcasts for estimation. Guarantees (classical CMS):
estimates never undercount, and overshoot exceeds ``e*N/w`` with
probability at most ``exp(-d)`` per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(
    tokens: DataFrame, d: int = 4, w: int = 1024, token_col: str = "term"
) -> DataFrame:
    """Build the ``d x w`` counter table from a token stream.

    Each token increments one cell per hash row; the ``d`` row hashes
    are ``xxhash64(token, row_seed)``. One explode (d small constants)
    plus one hash aggregation on the bounded cell key.
    """
    cells = tokens.select(
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(token_col), F.lit(i)), F.lit(w)
                    )
                    for i in range(d)
                ]
            )
        ).alias("row", "col")
    )
    return cells.groupBy("row", "col").agg(
        F.count(F.lit(1)).alias("cell_count")
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    d: int = 4,
    w: int = 1024,
    token_col: str = "term",
) -> DataFrame:
    """Point-frequency estimates: min over the ``d`` cells a term hashes
    to. The sketch is at most ``d*w`` rows, so it broadcasts; the query
    side stays where it is."""
    probes = queries.select(
        token_col,
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(token_col), F.lit(i)), F.lit(w)
                    )
                    for i in range(d)
                ]
            )
        ).alias("row", "col"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(token_col)
        .agg(
            F.min(F.coalesce(F.col("cell_count"), F.lit(0))).alias(
                "est_count"
            )
        )
    )
