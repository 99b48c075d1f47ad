"""ANSI-mode smoke sweep + reference tests for the round-7 registry
additions. Value correctness is gated by the oracle suite; these pin
(a) strict-cast/overflow robustness and (b) operator semantics against
driver-side pure-Python references, independent of DuckDB."""

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_DIR

ROUND7 = [
    "time_travel_orders",
    "unpivot_stack_metrics",
    "trend_per_event_type",
    "hierarchy_subtree_rollup",
    "emb_power_iteration",
    "graph_triangle_census",
    "session_window_native",
    "agg_bitmap_distinct",
    "text_repetition_signals",
    "quality_pr_curve",
    "lang_confusion_matrix",
    "dedup_keep_best_quality",
    "scan_multiformat_roundtrip",
    "emb_dimension_profile",
    "dq_column_profile",
    "join_asof_nearest",
    "mixture_temperature_sources",
    "ts_lag_correlation",
    "ts_month_over_month",
    "curation_token_budget_fill",
]


@pytest.mark.parametrize("name", ROUND7)
def test_round7_query_runs_under_ansi(spark, name):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = entry.queries()[name](spark, SF_DIR)
        assert df.count() >= 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def _ref_power_iteration(vecs, iters, scale=1000, offset=1000, top_k=10):
    """Driver-side integer reference of power_iteration_pc1."""
    import math

    u = {
        i: [int(math.floor(float(x) * scale)) + offset for x in v]
        for i, v in vecs
    }
    first = min(u)
    vvec = list(u[first])
    s = {}
    for t in range(iters):
        s = {i: sum(a * b for a, b in zip(ui, vvec)) for i, ui in u.items()}
        if t == iters - 1:
            break
        dim = len(vvec)
        w = [sum(s[i] * u[i][j] for i in u) for j in range(dim)]
        m = max(w)
        vvec = [(x << 20) // m for x in w]
    order = sorted(s, key=lambda i: (-s[i], i))[:top_k]
    return [(r + 1, i, s[i]) for r, i in enumerate(order)]


@pytest.mark.parametrize("seed", [7, 21])
def test_power_iteration_matches_integer_reference(spark, seed):
    """Randomized corpus, float32 round-trip quantization, exact
    superstep-for-superstep agreement with the pure-Python integer
    reference (the same proof style as the fixed-point k-means)."""
    import random
    import struct

    from near_event_streams_spark.operators.similarity import (
        power_iteration_pc1,
    )

    rng = random.Random(seed)
    dim = rng.randint(3, 8)
    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]
    vecs = [
        (i, [f32(rng.uniform(-0.9, 0.9)) for _ in range(dim)])
        for i in range(rng.randint(15, 40))
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = [
        (r["rank"], r["vec_id"], r["proj_units"])
        for r in power_iteration_pc1(df, iters=3, top_k=5).collect()
    ]
    assert got == _ref_power_iteration(vecs, 3, top_k=5), f"seed={seed}"


def test_power_iteration_rejects_out_of_range_components(spark):
    from near_event_streams_spark.operators.similarity import (
        power_iteration_pc1,
    )

    df = spark.createDataFrame(
        [(0, [-1.5, 0.0]), (1, [0.2, 0.3])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="quantized unit"):
        power_iteration_pc1(df, iters=2, top_k=2)


def test_hierarchy_rollup_hand_checked(spark):
    """Digit-trie subtree rollup on a 6-supplier toy tree:
    node 1 owns {1, 12, 123}, node 12 owns {12, 123}, node 9 owns
    {9, 99}; balances sum along those subtrees exactly."""
    from pyspark.sql import functions as F

    from near_event_streams_spark.plans.analytics_ext import (
        hierarchy_subtree_rollup,
    )

    rows = [(1, 10.0), (12, 20.0), (123, 40.0), (9, 1.0), (99, 2.0),
            (500, 7.0)]
    df = spark.createDataFrame(rows, "s_suppkey long, s_acctbal double")
    import near_event_streams_spark.plans.analytics_ext as ext

    orig = ext._t
    ext._t = lambda sp, sf, name: df  # the query only reads supplier
    try:
        got = {
            r["node"]: (r["n_subtree"], r["subtree_acctbal"])
            for r in hierarchy_subtree_rollup(spark, "ignored").collect()
        }
    finally:
        ext._t = orig
    assert got == {
        1: (3, 70.0),
        12: (2, 60.0),
        123: (1, 40.0),
        9: (2, 3.0),
        99: (1, 2.0),
        500: (1, 7.0),
        50: (1, 7.0),
        5: (1, 7.0),
    }, got


def test_triangle_count_hand_checked(spark):
    """K4 plus a pendant edge: C(4,3)=4 triangles; wedges =
    3·C(3,2)+C(4,2)=15 (three degree-3 nodes, one degree-4 node);
    clustering = 12/15 = 0.8. Duplicate/reversed input edges must
    normalize away."""
    from near_event_streams_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = k4 + [(4, 5)] + [(2, 1), (3, 1)]  # reversed dups
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).first()
    assert (
        row["n_nodes"],
        row["n_edges"],
        row["n_triangles"],
        row["n_wedges"],
        row["global_clustering"],
    ) == (5, 7, 4, 15, 0.8), row


def test_repetition_signals_hand_checked(spark):
    """'a b c a b c a b' → trigrams: [abc, bca, cab, abc, bca, cab] —
    all 6 occurrences repeat (fraction 1.0); bigrams: ab×3, bc×2,
    ca×2 of 7 → top share 3/7. A 2-word doc has zero trigrams."""
    from near_event_streams_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [(0, "a b c a b c a b"), (1, "x y"), (2, "unique words only here")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_trigrams"],
            r["n_repeated_trigrams"],
            r["tri_rep_fraction"],
            r["top_bigram_share"],
        )
        for r in repetition_signals(docs).collect()
    }
    assert got[0] == (6, 6, 1.0, round(3 / 7, 6) + 0.0), got[0]
    assert got[1] == (0, 0, 0.0, 1.0), got[1]
    assert got[2][1] == 0 and got[2][2] == 0.0, got[2]
