"""Edge cases for the round-4 operators the driver gates only on the
main path: SemDeDup keep/pair forms and CCNet perplexity bucketing."""

from pyspark.sql import functions as F

from near_event_streams_spark.operators import curation, similarity


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_identical_vectors_keep_min_id(spark):
    v = [1.0, 0.0, 0.0, 0.0]
    rows = [(3, v), (1, v), (2, [0.0, 1.0, 0.0, 0.0])]
    kept = similarity.semantic_dedup_keep(
        _emb(spark, rows), threshold=0.99, n_clusters=2
    )
    assert {r["vec_id"] for r in kept.collect()} == {1, 2}


def test_semantic_dedup_below_threshold_keeps_all(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    kept = similarity.semantic_dedup_keep(
        _emb(spark, rows), threshold=0.5, n_clusters=2
    )
    assert kept.count() == 3


def _scored(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, avg_logprob double"
    )


def test_perplexity_buckets_single_doc_group_is_head(spark):
    """One doc: both thresholds equal its score; score >= hi -> head."""
    out = curation.perplexity_buckets(_scored(spark, [(1, "xx", -2.5)]))
    assert out.collect()[0]["bucket"] == "head"


def test_perplexity_buckets_all_equal_scores_are_head(spark):
    rows = [(i, "xx", -1.0) for i in range(9)]
    out = curation.perplexity_buckets(_scored(spark, rows))
    assert {r["bucket"] for r in out.collect()} == {"head"}


def test_perplexity_buckets_groups_are_independent(spark):
    """A language whose scores all sit below another language's range
    must still split into its own head/middle/tail."""
    rows = [(i, "aa", float(i)) for i in range(9)]
    rows += [(100 + i, "bb", -100.0 + i) for i in range(9)]
    out = curation.perplexity_buckets(_scored(spark, rows)).collect()
    for lang in ("aa", "bb"):
        got = {r["bucket"] for r in out if r["lang"] == lang}
        assert got == {"head", "middle", "tail"}, (lang, got)
    # per-lang head membership is the lang's own top scores (head is
    # score >= q(2/3) INCLUSIVE, and percentile_approx returns the value
    # at rank ceil(p*n): q = 5.0 for 0..8, so the head holds 4 of 9)
    aa_head = {r["doc_id"] for r in out
               if r["lang"] == "aa" and r["bucket"] == "head"}
    assert aa_head == {5, 6, 7, 8}, aa_head
