"""Unit tests for the iterative graph family (operators/graph.py):
fixed-point PageRank semantics on known graphs, partitioning
invariance, and mass accounting."""

from pyspark.sql import functions as F

from near_event_streams_spark.operators.graph import SCALE, pagerank


def _ranks(df):
    return {r["node"]: r["pagerank_units"] for r in df.collect()}


def test_pagerank_cycle_is_uniform(spark):
    """A directed 3-cycle is perfectly symmetric: every node must hold
    exactly the same fixed-point rank at every iteration."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got = _ranks(pagerank(edges, iterations=5))
    assert len(set(got.values())) == 1
    # each node keeps ~1/3 of the mass (fixed-point floors shave ulps)
    assert abs(next(iter(got.values())) - SCALE // 3) <= 5


def test_pagerank_star_center_dominates(spark):
    """Star graph (spokes -> hub, hub -> spokes): the hub collects the
    damped mass of every spoke and must outrank all of them; spokes
    stay symmetric with each other."""
    spokes = [f"s{i}" for i in range(8)]
    rows = [(s, "hub") for s in spokes] + [("hub", s) for s in spokes]
    edges = spark.createDataFrame(rows, "src string, dst string")
    got = _ranks(pagerank(edges, iterations=5))
    assert all(got["hub"] > got[s] for s in spokes)
    assert len({got[s] for s in spokes}) == 1


def test_pagerank_partitioning_invariant(spark):
    """Fixed-point arithmetic makes the result independent of input
    partitioning — the property the float formulation cannot give."""
    import random

    rng = random.Random(7)
    rows = [
        (f"n{rng.randrange(40)}", f"n{rng.randrange(40)}")
        for _ in range(300)
    ]
    edges = spark.createDataFrame(rows, "src string, dst string")
    a = _ranks(pagerank(edges, iterations=4))
    b = _ranks(pagerank(edges.repartition(17), iterations=4))
    assert a == b


def test_pagerank_symmetric_mass_conserved(spark):
    """On a symmetrized edge list there are no dangling nodes, so total
    mass stays ~1 (short only the integer-floor shavings: at most
    edges + nodes units per iteration)."""
    rows = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    sym = rows + [(b, a) for a, b in rows]
    edges = spark.createDataFrame(sym, "src string, dst string")
    out = pagerank(edges, iterations=5)
    total = out.agg(F.sum("pagerank_units").alias("t")).head()["t"]
    assert SCALE * 0.999 <= total <= SCALE
    # float view is exactly units / SCALE
    for r in out.collect():
        assert r["pagerank"] == r["pagerank_units"] / SCALE


def test_label_propagation_finds_planted_communities(spark):
    """Two disjoint triangles: every node must converge to its
    triangle's lexicographically-smallest member; the bridge-free
    components never exchange labels. Also pins the tie-break: in
    round 1 every node sees each neighbor label once, so the smallest
    label wins deterministically."""
    from near_event_streams_spark.operators.graph import (
        label_propagation,
    )

    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    rows = tri1 + tri2 + [(b, a) for a, b in tri1 + tri2]
    edges = spark.createDataFrame(rows, "src string, dst string")
    out = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=4).collect()
    }
    assert out == {
        "a": "a", "b": "a", "c": "a",
        "x": "x", "y": "x", "z": "x",
    }, out


def test_label_propagation_isolated_node_keeps_label(spark):
    """A node with no in-edges never adopts anything (the COALESCE
    branch) — and its out-neighbor sees its label."""
    from near_event_streams_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [("lonely", "hub"), ("hub", "other"), ("other", "hub")],
        "src string, dst string",
    )
    out = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert out["lonely"] == "lonely"


def test_label_propagation_matches_python_reference_random(spark):
    """Seeded random digraphs: the DataFrame superstep loop must equal
    a driver-side synchronous replay (most-frequent in-neighbor label,
    min-label ties, keep-if-isolated) node-for-node."""
    import random
    from collections import Counter

    from near_event_streams_spark.operators.graph import (
        label_propagation,
    )

    def ref(edges, iters):
        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        lab = {n: n for n in nodes}
        inn = {}
        for a, b in edges:
            inn.setdefault(b, []).append(a)
        for _ in range(iters):
            nxt = {}
            for n in nodes:
                srcs = inn.get(n)
                if not srcs:
                    nxt[n] = lab[n]
                    continue
                c = Counter(lab[s] for s in srcs)
                nxt[n] = min(
                    c, key=lambda label: (-c[label], label)
                )
            lab = nxt
        return lab

    for seed in (3, 17, 51):
        rng = random.Random(seed)
        n = rng.randint(6, 14)
        names = [f"n{i:02d}" for i in range(n)]
        edges = list(
            {
                (rng.choice(names), rng.choice(names))
                for _ in range(rng.randint(n, 3 * n))
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iterations=3).collect()
        }
        assert got == ref(edges, 3), f"seed={seed}"
