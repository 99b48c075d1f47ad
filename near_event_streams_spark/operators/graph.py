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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SCALE = 10**8  # fixed-point units per unit of rank
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as an exact rational

#: node vectors at or below this row count broadcast to the superstep
#: join (~40-80 B/entry hashed → ≤ ~80 MB); larger graphs fall back to
#: the shuffle join against the src-partitioned edge cache. Same
#: size-adaptive contract as ``TRIANGLE_MAX_BROADCAST_ENTRIES`` — the
#: former code left the choice to the planner's stats guess on a
#: checkpointed LogicalRDD, which happened to broadcast locally but is
#: an accident of estimate propagation, not a decision (guide §3.1:
#: pick the strategy deliberately).
GRAPH_MAX_BROADCAST_NODES = 1_000_000

#: target rows per partition for the per-superstep edge cache. The
#: iterative operators aggregate O(edges) rows into O(nodes) per
#: superstep; with the cache split across every core, each map task
#: holds the FULL node-key hash table and partial aggregation stops
#: reducing anything (32 tasks x n_nodes partials ~ half the input
#: re-shuffled, measured r17 at sf0.1). Deriving the partition count
#: from the measured edge count (guide §2.2 "fewer, larger partitions",
#: capped at spark.sql.shuffle.partitions so a real cluster's budget
#: still applies) keeps map tasks big enough that the partial agg
#: collapses the shuffle at ANY graph size.
EDGE_CACHE_ROWS_PER_PARTITION = 262_144


def _edge_cache_partitions(n_edges: int, conf_partitions: int) -> int:
    """Size-derived partition count for an O(edges) superstep cache:
    ceil(n_edges / EDGE_CACHE_ROWS_PER_PARTITION), at least 2, never
    above the session shuffle-partition budget (the cluster-scale
    cap — past it, per-partition row counts grow with the data and
    AQE handles the downstream stages)."""
    sized = -(-n_edges // EDGE_CACHE_ROWS_PER_PARTITION)  # ceil div
    return max(2, min(conf_partitions, sized))


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

    ``checkpoint=True`` truncates each iteration's lineage via LAZY
    ``localCheckpoint`` — mandatory beyond a few supersteps (lineage
    doubles per round) and the reason each superstep is computed once.
    Lazy (r17, the BPE-trainer lesson): an eager checkpoint was its own
    job per superstep; the lazy form keeps the identical plan
    truncation but folds materialization into the one job that
    consumes the final rank vector — 1 job instead of iterations+1.
    Set False only for plan-inspection tests.
    """
    # Cache the edge list HASH-PARTITIONED ON THE JOIN KEY: every
    # superstep joins on src, so the big side never re-shuffles — only
    # the O(nodes) rank vector moves each round. (Without this the
    # union's doubled partition count also fragments every superstep
    # into task-overhead-dominated splits.) r17: the out-degree is
    # FOLDED INTO the cached edge list once at build — it is loop-
    # constant, and the former per-superstep ``join(outdeg, "src")``
    # re-paid a join of the full edge stream every round for a value
    # that never changes (guide §2.4: establish a partitioning/
    # decoration once, not once per pass).
    spark = edges.sparkSession
    nparts_conf = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # r17: the raw edge list is persisted and counted FIRST so the
    # cache partition count can be derived from the measured edge count
    # (see _edge_cache_partitions) instead of pinning the session
    # shuffle budget — the decorated cache is then built from this
    # in-memory frame (no second edge-build pass) and the raw handle is
    # released once the decorated cache is materialized.
    raw = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    n_edges = raw.count()
    nparts = _edge_cache_partitions(n_edges, nparts_conf)
    outdeg = raw.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    sym = raw.join(outdeg, "src").repartition(nparts, "src").persist()
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
        .persist()  # reused every superstep; caller may clearCache after
    )
    # r17: N is read ONCE as a driver scalar (one bounded count over
    # the cached node vector — the e.count() contract) and teleport /
    # the uniform start become PLAIN LITERALS. The former 1-row
    # ``crossJoin(broadcast(n agg))`` re-ran the aggregate and paid a
    # fresh broadcast build inside EVERY superstep's checkpoint job —
    # pure fixed latency, 6× per query. Python ``//`` on non-negative
    # ints == SQL ``div`` here, so the values are bit-identical.
    n_nodes = nodes.count()
    # broadcast the O(nodes) rank vector into the superstep join when
    # the driver-known count allows it; identical rows either way.
    # (raw stays persisted under the caller-owned clearCache contract —
    # an eager unpersist here would force every fresh invocation in the
    # same session to re-run the edge build for the sizing count.)
    bcast_vec = n_nodes <= GRAPH_MAX_BROADCAST_NODES
    teleport = F.lit(
        (_DAMP_DEN - _DAMP_NUM) * SCALE // (_DAMP_DEN * n_nodes)
    ).cast("long")
    ranks = nodes.select(
        "node", F.lit(SCALE // n_nodes).cast("long").alias("pr")
    )
    if checkpoint:
        ranks = ranks.localCheckpoint(eager=False)
    for _ in range(iterations):
        # r17: dst-nodes with no in-mass are handled by UNIONING a
        # zero-contribution seed row per node into the aggregate
        # instead of LEFT-JOINING the node vector onto the aggregated
        # result — one O(nodes) union input replaces a per-superstep
        # join (build + probe of two O(nodes) sides) and the
        # coalesce; Σ over {0} ∪ contribs == coalesce(Σ contribs, 0).
        rv = F.broadcast(ranks) if bcast_vec else ranks
        contrib = (
            rv.join(sym, rv["node"] == sym["src"])
            .select(
                F.col("dst").alias("node"),
                _idiv(F.col("pr"), F.col("deg")).alias("c"),
            )
            .unionByName(
                nodes.select("node", F.lit(0).cast("long").alias("c"))
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = contrib.select(
            "node",
            (
                teleport
                + _idiv(
                    F.lit(_DAMP_NUM).cast("long") * F.col("in_mass"),
                    F.lit(_DAMP_DEN).cast("long"),
                )
            ).alias("pr"),
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
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
    count aggregate plus a per-dst struct-MIN aggregate over the
    already-reduced label counts unioned with a zero-count own-label
    seed (≤ distinct-labels rows per node, never raw edges — and no
    per-node sort window, no keep-own-label join); LAZY
    ``localCheckpoint`` truncates the label vector's lineage per
    superstep while folding materialization into the single job that
    consumes the final vector (r17 — see :func:`pagerank`).
    """
    spark = edges.sparkSession
    nparts_conf = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # r17: size-derived edge-cache partitioning + deliberate broadcast
    # of the O(nodes) label vector — see :func:`pagerank` for both.
    raw = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    n_edges = raw.count()
    nparts = _edge_cache_partitions(n_edges, nparts_conf)
    sym = raw.repartition(nparts, "src").persist()
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
        .persist()  # reused every superstep; caller owns clearCache
    )
    n_nodes = nodes.count()
    bcast_vec = n_nodes <= GRAPH_MAX_BROADCAST_NODES
    labels = nodes.select("node", F.col("node").alias("label"))
    if checkpoint:
        labels = labels.localCheckpoint(eager=False)
    for _ in range(iterations):
        # r17: keep-own-label fallback is a WEIGHT-0 SEED row
        # (node, own_label, w=0) unioned into the neighbor-label stream
        # instead of a per-superstep left join of the label vector onto
        # the winners: any real neighbor label (cnt >= 1) beats the
        # seed, a node with no in-neighbors keeps its own label via the
        # seed, and a seed matching a neighbor label adds 0 — winner
        # identical in all three cases, one join fewer per superstep.
        #
        # ONE exchange per superstep (guide §2.4): the stream is
        # explicitly hash-repartitioned on ``node`` once, and BOTH
        # aggregates run on that partitioning without further shuffles
        # — HashPartitioning(node) satisfies the clustering requirement
        # of the (node, label) count AND the per-node struct-MIN (a
        # subset-key partitioning co-locates every row of each node).
        # The former shape shuffled twice per superstep: once for the
        # (node, label) count, once more for the per-node argmin.
        lv = F.broadcast(labels) if bcast_vec else labels
        weighted = (
            lv.join(sym, lv["node"] == sym["src"])
            .select(
                F.col("dst").alias("node"),
                "label",
                F.lit(1).cast("long").alias("w"),
            )
            .unionByName(
                labels.select(
                    "node", "label", F.lit(0).cast("long").alias("w")
                )
            )
            .repartition(nparts, "node")
        )
        counts = weighted.groupBy("node", "label").agg(
            F.sum("w").alias("cnt")
        )
        # adopt = arg-max by (cnt DESC, label ASC), expressed as ONE
        # struct-MIN aggregate over the reduced (node, label) counts —
        # byte-identical winner to the former row_number window (struct
        # ordering is lexicographic: -cnt ascending = cnt descending,
        # then label ascending) with NO per-node sort (r17; guide §2.3)
        labels = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("_negcnt"),
                        F.col("label").alias("_l"),
                    )
                ).alias("_best")
            )
            .select("node", F.col("_best._l").alias("label"))
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=False)
    return labels


#: adjacency tables whose total entry count is at or below this
#: broadcast to the closure join (8 B/entry → ≤ ~80 MB framed); larger
#: graphs take the equi-join path. Same size-adaptive contract as
#: ``dedup._verify_pairs(max_broadcast_docs=)``.
TRIANGLE_MAX_BROADCAST_ENTRIES = 10_000_000


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact global triangle count + clustering coefficient by
    DEGREE-ORIENTED adjacency intersection — the work-optimal O(m^1.5)
    formulation: orient every undirected edge from its
    lexicographically-smaller (degree, id) endpoint to the larger, so
    each node's OUT-degree is bounded by ~√(2m); every triangle
    {x ≺ y ≺ z} is then counted exactly once at its oriented edge
    (x, y), as z ∈ N⁺(x) ∩ N⁺(y).

    r17 (optimization): the closure used to be a wedge JOIN — a1(u,v) ⋈
    a2(u,w) materialized every oriented wedge (O(m^1.5) ROWS through an
    exchange; 135M rows at sf0.1) and re-joined them against the edge
    list. The count is instead computed per EDGE: collect each node's
    oriented out-neighborhood once (O(m) total entries, per-array
    bounded by √(2m) thanks to the orientation) and sum
    ``|N⁺(u) ∩ N⁺(v)|`` over oriented edges with a JVM-codegen
    ``array_intersect`` — identical total (each wedge is tested exactly
    once inside the intersection), same O(m^1.5) work bound, but the
    only rows ever shuffled are the O(m) edges and the O(m)-entry
    adjacency table, never the wedges (guide §2.3/§2.4: shuffle keys
    and bounded metadata, not the quadratic intermediate). When the
    adjacency table is small enough it broadcasts and the closure runs
    entirely in the edge scan stage; past
    ``TRIANGLE_MAX_BROADCAST_ENTRIES`` the closure is two equi-joins —
    the shuffled bytes are Σ_edges |N⁺(u)|+|N⁺(v)| = O(m^1.5) ~8-byte
    entries, still strictly less than the wedge join moved (the wedge
    rows were ~32 B each AND re-joined; see OPTIMIZATION_r17.md for
    the sf0.1 A/B against the 15.6-21.6 s wedge-join band).

    No theta join, no driver collect of data (the adjacency-size gate
    reads one count from the already-persisted edge cache); the output
    is one summary row (node/edge/triangle counts and the global
    clustering coefficient 3·T / #wedges, with the ratio rounded via
    the engine-exact integer HALF_UP helper).
    """
    from near_event_streams_spark.functions.rounding import half_up6_spark

    # e feeds deg + the orientation join + the edge count; deg feeds
    # two endpoint joins + the node/wedge aggregate; oriented feeds the
    # adjacency build + the closure probe. Without persist each consumer
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
    ).persist()
    # oriented out-neighborhoods: O(m) entries total, each array ≤
    # √(2m) by the degree orientation (the bound that keeps a hot
    # node's row from exploding)
    adj = (
        oriented.groupBy("u")
        .agg(F.collect_list("v").alias("nbrs"))
        .persist()
    )
    n_edges_val = e.count()  # also warms the persist for every consumer
    small = n_edges_val <= TRIANGLE_MAX_BROADCAST_ENTRIES
    au = adj.select(F.col("u").alias("_au"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("u").alias("_av"), F.col("nbrs").alias("nv"))
    closure = (
        oriented.join(
            F.broadcast(au) if small else au,
            oriented["u"] == au["_au"],
        )
        # inner on v: an edge whose head has no out-neighbors closes no
        # triangle and contributes exactly 0 to the sum
        .join(
            F.broadcast(av) if small else av,
            oriented["v"] == av["_av"],
        )
        .select(
            F.size(F.array_intersect("nu", "nv")).cast("long").alias("t")
        )
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
    tri_agg = closure.agg(
        F.coalesce(F.sum("t"), F.lit(0).cast("long")).alias("n_triangles")
    )
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
