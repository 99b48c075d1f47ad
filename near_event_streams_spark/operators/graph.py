"""Iterative graph algorithms on DataFrames: PageRank power iteration.

The Pregel-on-DataFrames shape Spark uses for graph workloads when a
dedicated graph engine isn't warranted: vertices and edges are plain
DataFrames, one superstep = join(ranks, edges) + aggregate-by-dst, and
``localCheckpoint`` truncates the lineage each round (the same guard
``dedup.connected_components`` uses — without it the plan doubles per
iteration).

Cross-engine determinism (so a SQL oracle can replay the result
bit-for-bit): floating-point SUM is order-dependent and even
ROUND(double, p) disagrees between engines at half-way boundaries
(Spark rounds the shortest decimal repr, DuckDB rounds in binary — an
off-by-1e-8 surfaced immediately at sf0.01). So the whole iteration
runs in FIXED-POINT integer units of 1e-8: integer division floors,
integer sums are exact, and every engine produces the identical bigint
rank vector. The float view is derived once at the end by dividing by
the power-of-ten scale (exact-input IEEE division — deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


SCALE = 10**8  # fixed-point units per unit of rank
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as an exact rational


def _idiv(a, b):
    """Exact integral division (SQL ``div``) with none of double's
    >2^53 risk. NON-NEGATIVE OPERANDS ONLY: Spark's ``div`` truncates
    toward zero while DuckDB's ``//`` floors, so the two diverge on
    negative inputs (-7 div 2 = -3 vs -7 // 2 = -4). PageRank's units
    and counts are all non-negative, where the two agree; do not reuse
    this helper for signed values expecting oracle parity."""
    return F.call_function("div", a, b)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    checkpoint: bool = True,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list. Returns
    ``(node, pagerank_units, pagerank)`` after ``iterations``
    supersteps from a uniform start — ``pagerank_units`` is the exact
    fixed-point rank (bigint, 1e-8 units), ``pagerank`` its float view.

    Per superstep: one join of the rank vector with the edge list on
    ``src`` and one sum-by-``dst`` — two key-equi shuffles, both on the
    node key, so AQE co-partitions them; the rank vector is O(nodes)
    and never collects to the driver. Nodes with no in-edges keep the
    teleport mass ``⌊0.15·SCALE/N⌋``; contributions of dangling nodes
    (no OUT-edges) are dropped, the standard simplified variant — feed
    a symmetrized edge list if mass conservation matters.

    ``checkpoint=True`` materializes each iteration via
    ``localCheckpoint`` — mandatory beyond a few supersteps (lineage
    doubles per round) and the reason each superstep is computed once.
    Set False only for plan-inspection tests.
    """
    # Cache the edge list HASH-PARTITIONED ON THE JOIN KEY: every
    # superstep joins on src, so the big side never re-shuffles — only
    # the O(nodes) rank vector moves each round. (Without this the
    # union's doubled partition count also fragments every superstep
    # into task-overhead-dominated splits.)
    spark = edges.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    sym = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .repartition(nparts, "src")
        .persist()
    )
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
        .persist()  # reused every superstep; caller may clearCache after
    )
    outdeg = (
        sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    )
    n = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n")))
    teleport = _idiv(
        F.lit((_DAMP_DEN - _DAMP_NUM) * SCALE).cast("long"),
        F.lit(_DAMP_DEN).cast("long") * F.col("n"),
    )
    ranks = nodes.crossJoin(n).select(
        "node", _idiv(F.lit(SCALE).cast("long"), F.col("n")).alias("pr")
    )
    if checkpoint:
        ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iterations):
        contrib = (
            ranks.join(sym, ranks["node"] == sym["src"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                _idiv(F.col("pr"), F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(n)
            .select(
                "node",
                (
                    teleport
                    + _idiv(
                        F.lit(_DAMP_NUM).cast("long")
                        * F.coalesce(
                            F.col("in_mass"), F.lit(0).cast("long")
                        ),
                        F.lit(_DAMP_DEN).cast("long"),
                    )
                ).alias("pr"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node",
        F.col("pr").alias("pagerank_units"),
        (F.col("pr").cast("double") / F.lit(float(SCALE))).alias(
            "pagerank"
        ),
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 4,
    checkpoint: bool = True,
) -> DataFrame:
    """Synchronous label-propagation community detection over a
    directed edge list (feed a symmetrized list for the undirected
    form). Returns ``(node, label)`` after ``iterations`` supersteps.

    Every node starts labeled with its own id; per superstep each node
    adopts the MOST FREQUENT label among its in-neighbors, ties to the
    lexicographically smallest label, and nodes with no in-edges keep
    their label — all integer counts and string comparisons, so the
    DuckDB oracle replays every superstep bit-for-bit (the
    deterministic-synchronous variant of Raghavan et al. 2007; the
    async random-order original is not reproducible across engines).

    Scale shape mirrors :func:`pagerank`: the edge list persists
    hash-partitioned on ``src`` so each superstep's join re-shuffles
    only the O(nodes) label vector; the adopt step is one (dst, label)
    count aggregate plus a per-dst rank window over the already-reduced
    label counts (≤ distinct-labels rows per node, never raw edges);
    ``localCheckpoint`` truncates the label vector's lineage per
    superstep.
    """
    spark = edges.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    sym = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .repartition(nparts, "src")
        .persist()
    )
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
        .persist()  # reused every superstep; caller owns clearCache
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    if checkpoint:
        labels = labels.localCheckpoint(eager=True)
    w = Window.partitionBy("node").orderBy(
        F.desc("cnt"), F.asc("label")
    )
    for _ in range(iterations):
        counts = (
            labels.join(sym, labels["node"] == sym["src"])
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = labels.join(best, "node", "left").select(
            "node",
            F.coalesce(F.col("new_label"), F.col("label")).alias(
                "label"
            ),
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=True)
    return labels


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact global triangle count + clustering coefficient by
    DEGREE-ORIENTED wedge join — the provably work-optimal single-pass
    formulation (O(m^1.5) worst case, vs O(Σdeg²) for naive wedge
    enumeration): orient every undirected edge from its
    lexicographically-smaller (degree, id) endpoint to the larger, so
    each node's OUT-degree is bounded by ~√(2m); every triangle then
    appears exactly once as an oriented wedge u→v, u→w (v before w in
    the same total order) closed by the oriented edge v→w.

    All three steps are equi-joins/aggregates — no theta join, no
    driver collect; the output is one summary row (node/edge/triangle
    counts and the global clustering coefficient 3·T / #wedges, with
    the ratio rounded via the engine-exact integer HALF_UP helper).
    """
    from near_event_streams_spark.functions.rounding import half_up6_spark

    # e feeds deg + the orientation join + the edge count; deg feeds
    # two endpoint joins + the node/wedge aggregate; oriented feeds the
    # two wedge legs + the closure probe. Without persist each consumer
    # recomputes the whole upstream subtree — the classic diamond-reuse
    # trap this operator's budget gate pins. The cache handles are
    # caller-owned (spark.catalog.clearCache()), the same contract as
    # label_propagation / kmeans_lloyd_fixedpoint.
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    ed = (
        e.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
    )
    lt = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(lt, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lt, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lt, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).persist()
    a1 = oriented.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    a2 = oriented.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = a1.join(a2, "u").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    tri = wedges.join(
        oriented.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
    )
    # one distributed plan: each summary is a 1-row scalar aggregate,
    # combined by 1-row cross joins (no driver-side counts)
    nodes_agg = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(
            F.expr("CAST(deg * (deg - 1) div 2 AS BIGINT)")
        ).alias("n_wedges"),
    )
    edges_agg = e.agg(F.count(F.lit(1)).alias("n_edges"))
    tri_agg = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        nodes_agg.crossJoin(edges_agg)
        .crossJoin(tri_agg)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.coalesce("n_wedges", F.lit(0)).alias("n_wedges"),
            F.when(
                F.coalesce("n_wedges", F.lit(0)) > 0,
                F.expr(half_up6_spark("n_triangles*3", "n_wedges")),
            )
            .otherwise(F.lit(0.0))
            .alias("global_clustering"),
        )
    )
