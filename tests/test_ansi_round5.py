"""ANSI-mode smoke sweep over the round-5 registry additions: every
new query must execute under ``spark.sql.ansi.enabled=true`` (strict
casts, error-on-overflow) — the COVERAGE.md robustness claim extended
to the new surface. Rows-only here; value correctness is gated by the
oracle tests."""

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_DIR

ROUND5 = [
    "active_users_hll",
    "knn_label_audit_ivf",
    "decontaminate_bloom_docs",
    "decontaminate_overlap_report",
    "sample_weighted_per_source",
    "graph_pagerank_copurchase",
    "text_kl_source_drift",
    "text_bpe_merges",
    "diag_key_skew_users",
    "join_pointintime_scd2",
    "hist_order_totals",
    "dq_audit_checks",
    "diff_snapshots_orders",
    "seq_event_trigrams",
    "feature_mad_outliers",
    "attribution_last_touch",
    "funnel_windowed_1d",
    "dq_functional_deps",
    "ts_seasonal_hourly",
    "emb_source_similarity",
    "curation_dsir_weights",
    "report_source_profile",
    "feature_cusum_alarms",
    "seq_markov_transitions",
    "text_source_entropy",
    "report_cross_source_dups",
    "hist_doc_tokens",
    "multimodal_resize_rasters",
    "multimodal_frame_sample",
]


@pytest.mark.parametrize("name", ROUND5)
def test_round5_query_runs_under_ansi(spark, name):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = entry.queries()[name](spark, SF_DIR)
        assert df.count() >= 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
