"""ANSI-mode smoke sweep over the round-6 registry additions: every
new query must execute under ``spark.sql.ansi.enabled=true`` (strict
casts, error-on-overflow) — the COVERAGE.md robustness claim extended
to the new surface. Rows-only here; value correctness is gated by the
oracle tests."""

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_DIR

ROUND6 = [
    "join_salted_user_spend",
    "emb_kmeans_lloyd",
    "dedup_containment_docs",
    "stats_corr_regression",
    "agg_mode_deterministic",
    "seq_gaps_islands",
    "rfm_customer_segments",
    "merge_upsert_orders",
    "graph_label_propagation",
    "split_train_val_test",
    "sample_cluster_balanced",
    "url_functions",
    "string_fuzzy_levenshtein",
    "text_bpe_apply",
]


@pytest.mark.parametrize("name", ROUND6)
def test_round6_query_runs_under_ansi(spark, name):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = entry.queries()[name](spark, SF_DIR)
        assert df.count() >= 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
