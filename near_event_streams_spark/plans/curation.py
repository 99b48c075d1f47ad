"""Corpus-assembly query surface: decontamination, deterministic
sampling / dataset mixture, sequence packing, grouped-Arrow accounting.

All six queries are exact-oracled in DuckDB — including greedy next-fit
packing, whose sequential recurrence the oracle replays with a recursive
CTE, and the md5-bucket sampling, whose hash is bit-identical across
engines by construction (that's why the sampler uses md5 and not
xxhash64/murmur3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_event_streams_spark.operators import curation
from near_event_streams_spark.plans._common import (
    half_up6_duck,
    half_up6_spark,
    half_up_signed_duck,
    half_up_signed_spark,
)
from near_event_streams_spark.sources.tables import load_table

EVAL_SOURCES = ("src0", "src1")
PACK_BUDGET = 256

# --------------------------------------------------------------------------
# decontamination
# --------------------------------------------------------------------------


def decontaminate_train_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-gram benchmark decontamination: docs from the two 'eval' sources
    define the contaminated n-gram set; every remaining (train) doc is
    flagged if it shares any 8-gram with them."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("source").isin(*EVAL_SOURCES)
    flagged = curation.decontaminate(
        docs.filter(~is_eval), docs.filter(is_eval), n=8
    )
    return flagged.select("doc_id", "source", "is_contaminated").orderBy(
        "doc_id"
    )


def _gram8(var: str = "w") -> str:
    return " || ' ' || ".join(f"{var}[i+{j}]" for j in range(8))


DECONTAMINATE_SQL = f"""
WITH words AS (
  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\\s+') AS w
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, source, {_gram8()} AS gram
  FROM words, unnest(range(1, len(w) - 6)) t(i)
  WHERE len(w) >= 8
), ev AS (
  SELECT DISTINCT gram FROM grams WHERE source IN ('src0', 'src1')
), bad AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE source NOT IN ('src0', 'src1') AND gram IN (SELECT gram FROM ev)
)
SELECT d.doc_id, d.source,
       d.doc_id IN (SELECT doc_id FROM bad) AS is_contaminated
FROM documents d
WHERE d.source NOT IN ('src0', 'src1')
ORDER BY d.doc_id
"""

def decontaminate_bloom_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered 8-gram decontamination: eval grams compress to
    a fixed-size broadcast bitmap probed inside codegen; only Bloom
    hits meet the real eval-gram join for exact verification. No false
    negatives, so the output — and the oracle — are IDENTICAL to the
    exact operator's."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("source").isin(*EVAL_SOURCES)
    # ~10+ bits per eval gram at sf0.1 (eval side ≈ 10^5 grams there);
    # the packed bitmap is m/64 longs = 256 KiB embedded either way.
    # The 8-gram explode amplifies each doc ~90×, so fan the train scan
    # out to the core count BEFORE exploding (a small file arrives as
    # ONE split; at 100 TB the same repartition bounds per-task explode
    # amplification). The flag set is known-tiny here, so skip the
    # size-adaptive count and broadcast the flags directly.
    flagged = curation.decontaminate_bloom(
        docs.filter(~is_eval).repartition(32),
        docs.filter(is_eval).repartition(8),
        n=8,
        m_bits=1 << 21,
        broadcast_flags=True,
    )
    return flagged.select("doc_id", "source", "is_contaminated").orderBy(
        "doc_id"
    )


def decontaminate_overlap_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Graded contamination report (``curation.contamination_overlap``):
    per train doc the count and fraction of its distinct 8-grams found
    in the eval sources — the thresholdable form of the boolean gate."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("source").isin(*EVAL_SOURCES)
    return curation.contamination_overlap(
        docs.filter(~is_eval), docs.filter(is_eval), n=8
    ).orderBy("doc_id")


OVERLAP_REPORT_SQL = f"""
WITH words AS (
  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\\s+') AS w
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, source, {_gram8()} AS gram
  FROM words, unnest(range(1, len(w) - 6)) t(i)
  WHERE len(w) >= 8
), ev AS (
  SELECT DISTINCT gram FROM grams WHERE source IN ('src0', 'src1')
), per_doc AS (
  SELECT g.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(COUNT(*) FILTER (WHERE gram IN (SELECT gram FROM ev))
              AS BIGINT) AS n_shared
  FROM grams g WHERE g.source NOT IN ('src0', 'src1')
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       COALESCE(n_grams, 0) AS n_grams,
       COALESCE(n_shared, 0) AS n_shared,
       CASE WHEN COALESCE(n_grams, 0) > 0
            THEN {half_up6_duck("n_shared", "n_grams")}
            ELSE 0.0 END AS overlap_pct
FROM documents d LEFT JOIN per_doc USING (doc_id)
WHERE d.source NOT IN ('src0', 'src1')
ORDER BY d.doc_id
"""


def sample_weighted_per_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stratified A-ES weighted sampling: 20 docs per source with
    within-source inclusion probability ∝ n_chars — the per-domain
    form of sample_weighted_topk (window-ranked per group, no global
    sort)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        curation.weighted_sample_per_group(
            docs.select("doc_id", "source", "n_chars"),
            "source",
            key=F.col("doc_id").cast("string"),
            weight=F.col("n_chars"),
            k_per_group=20,
        )
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("sample_rank").cast("long").alias("sample_rank"),
            "sample_priority",
        )
        .orderBy("source", "sample_rank")
    )


SAMPLE_WEIGHTED_GROUP_SQL = """
WITH p AS (
  SELECT doc_id, source, n_chars,
    ln((CAST(CAST(('0x' || substr(
          md5(CAST(doc_id AS VARCHAR) || '|' || 'wsg'), 1, 13))
        AS UBIGINT) AS DOUBLE) + 0.5) / 4503599627370496.0)
    / CAST(n_chars AS DOUBLE) AS pri
  FROM documents
), ranked AS (
  SELECT doc_id, source, n_chars, pri,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY pri DESC, CAST(doc_id AS VARCHAR)
         ) AS BIGINT) AS sample_rank
  FROM p
)
SELECT doc_id, source, n_chars, sample_rank,
       ROUND(pri, 6) + 0.0 AS sample_priority
FROM ranked
WHERE sample_rank <= 20
ORDER BY source, sample_rank
"""


# --------------------------------------------------------------------------
# deterministic sampling + mixture
# --------------------------------------------------------------------------


def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep ~30% of documents by md5 bucket of doc_id — run-stable,
    engine-portable subsampling (the oracle recomputes the identical
    buckets from the identical md5)."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.col("doc_id").cast("string")
    kept = curation.hash_sample(docs, key, rate_pct=30, salt="v1")
    return kept.select(
        "doc_id",
        "source",
        curation.hash_bucket(key, salt="v1").alias("bucket"),
    ).orderBy("doc_id")


SAMPLE_HASH_SQL = """
WITH b AS (
  SELECT doc_id, source,
         CAST(CAST(('0x' || substr(
               md5(CAST(doc_id AS VARCHAR) || '|' || 'v1'), 1, 8))
             AS UBIGINT) % 100 AS BIGINT) AS bucket
  FROM documents
)
SELECT doc_id, source, bucket FROM b WHERE bucket < 30
ORDER BY doc_id
"""


def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split
    (``curation.train_val_test_split``, md5 key buckets — membership
    survives reruns, repartitioning and engine swaps), rolled up per
    (source, split) with token counts — the split-manifest audit a
    training pipeline records next to its data card. The oracle
    recomputes identical buckets from the identical md5."""
    from near_event_streams_spark.operators.text import token_count_regex

    docs = load_table(spark, sf_dir, "documents")
    split = curation.train_val_test_split(
        docs, F.col("doc_id").cast("string")
    )
    return (
        split.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                token_count_regex(F.col("text")).cast("long")
            ).alias("n_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("source", "split")
    )


SPLIT_TVT_SQL = """
WITH b AS (
  SELECT doc_id, source, text,
         CAST(CAST(('0x' || substr(
               md5(CAST(doc_id AS VARCHAR) || '|' || 'split-v1'), 1, 8))
             AS UBIGINT) % 100 AS BIGINT) AS bucket
  FROM documents
), s AS (
  SELECT doc_id, source, text,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM b
)
SELECT source, split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')))
            AS BIGINT) AS n_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


MIXTURE_RATES = {"src0": 90, "src1": 60, "src2": 30}
MIXTURE_DEFAULT = 15


def mixture_weighted_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixture: per-source sampling rates (90/60/30%,
    default 15%) applied as one narrow deterministic filter."""
    docs = load_table(spark, sf_dir, "documents")
    kept = curation.mixture_sample(
        docs,
        "source",
        MIXTURE_RATES,
        MIXTURE_DEFAULT,
        key=F.col("doc_id").cast("string"),
        salt="mix1",
    )
    return kept.select("doc_id", "source", "lang").orderBy("doc_id")


MIXTURE_SQL = """
WITH b AS (
  SELECT doc_id, source, lang,
         CAST(CAST(('0x' || substr(
               md5(CAST(doc_id AS VARCHAR) || '|' || 'mix1'), 1, 8))
             AS UBIGINT) % 100 AS BIGINT) AS bucket,
         CASE source WHEN 'src0' THEN 90 WHEN 'src1' THEN 60
                     WHEN 'src2' THEN 30 ELSE 15 END AS rate
  FROM documents
)
SELECT doc_id, source, lang FROM b WHERE bucket < rate
ORDER BY doc_id
"""

# --------------------------------------------------------------------------
# sequence packing
# --------------------------------------------------------------------------


def pack_docs_concat_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split packing into 256-token bins per source shard."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.pack_concat_split(docs, budget=PACK_BUDGET).orderBy(
        "doc_id"
    )


PACK_CONCAT_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS INT)
           AS n_tokens
  FROM documents
)
SELECT doc_id, source, n_tokens,
       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
              PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / {PACK_BUDGET}.0) AS BIGINT) AS bin_id
FROM toks
ORDER BY doc_id
"""


def pack_docs_next_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy next-fit packing (docs never split) into 256-token bins per
    source shard; the oracle replays the same sequential recurrence with
    a recursive CTE."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.pack_next_fit(docs, budget=PACK_BUDGET).orderBy(
        "source", "doc_id"
    )


PACK_NEXT_FIT_SQL = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS INT)
           AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
pack(doc_id, source, n_tokens, rn, bin_id, fill) AS (
  -- DuckDB recursive CTEs must be exactly <base> UNION <recursive>
  SELECT doc_id, source, n_tokens, rn, CAST(0 AS BIGINT), n_tokens
  FROM toks WHERE rn = 1
  UNION
  SELECT n.doc_id, n.source, n.n_tokens, n.rn,
         CASE WHEN p.fill + n.n_tokens > {PACK_BUDGET}
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill + n.n_tokens > {PACK_BUDGET}
              THEN n.n_tokens ELSE p.fill + n.n_tokens END
  FROM pack p JOIN toks n ON n.source = p.source AND n.rn = p.rn + 1
)
SELECT doc_id, source, n_tokens, bin_id FROM pack
ORDER BY source, doc_id
"""

# --------------------------------------------------------------------------
# grouped-Arrow accounting
# --------------------------------------------------------------------------


def arrow_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus stats computed group-at-a-time in Arrow
    (``applyInArrow``); the oracle is the plain aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.group_stats_arrow(docs).orderBy("source")


ARROW_STATS_SQL = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MAX(n_chars) AS max_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
ORDER BY source
"""

def curation_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language perplexity bucketing: score every doc
    with the corpus char-bigram LM (``text.lm_bigram_logprob``), label
    head/middle/tail against the language's percentile_approx
    thresholds (``curation.perplexity_buckets``), and gate the bucket
    BALANCE per language: head and tail must each hold a third of the
    language's docs within 5% + 2 rows (ties at the threshold and the
    GK sketch's <1-row rank error at this scale are the slack).
    DuckDB recomputes the exact per-language doc counts and pins the
    balance booleans TRUE. The labeling itself deliberately avoids a
    per-language percent_rank window — one-task-per-language does not
    scale; thresholds come from one mergeable sketch aggregation.
    """
    from near_event_streams_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    scored = text_ops.lm_bigram_logprob(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    labeled = curation.perplexity_buckets(scored)
    tol = 0.05 * F.col("n_docs").cast("double") + 2.0
    third = F.col("n_docs").cast("double") / 3.0
    return (
        labeled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("bucket") == "head", 1).otherwise(0)
            ).alias("n_head"),
            F.sum(
                F.when(F.col("bucket") == "tail", 1).otherwise(0)
            ).alias("n_tail"),
        )
        .select(
            "lang",
            "n_docs",
            (
                F.abs(F.col("n_head").cast("double") - third) <= tol
            ).alias("head_balanced_ok"),
            (
                F.abs(F.col("n_tail").cast("double") - third) <= tol
            ).alias("tail_balanced_ok"),
        )
        .orderBy("lang")
    )


CURATION_PERPLEXITY_SQL = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       TRUE AS head_balanced_ok,
       TRUE AS tail_balanced_ok
FROM documents
GROUP BY lang
ORDER BY lang
"""


def epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-2 training shuffle of the corpus into 8
    shards: pseudorandom (shard, pos_in_shard) placement, reproducible
    across engines from the same md5 permutation key."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        curation.epoch_shuffle(
            docs.select("doc_id", "source"),
            key=F.col("doc_id").cast("string"),
            epoch=2,
            n_shards=8,
        )
        .select(
            "doc_id",
            "source",
            "shard",
            F.col("pos_in_shard").cast("long").alias("pos_in_shard"),
        )
        .orderBy("doc_id")
    )


EPOCH_SHUFFLE_SQL = """
WITH placed AS (
  SELECT doc_id, source,
         md5('shuf:2' || '|' || CAST(doc_id AS VARCHAR)) AS okey,
         CAST(CAST(('0x' || substr(
               md5('shuf:2' || '|' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) % 8 AS BIGINT) AS shard
  FROM documents
)
SELECT doc_id, source, shard,
       CAST(row_number() OVER (PARTITION BY shard
                ORDER BY okey, CAST(doc_id AS VARCHAR)) AS BIGINT)
         AS pos_in_shard
FROM placed
ORDER BY doc_id
"""


def cap_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: keep at most 120 docs per source, preferring
    longer documents (n_chars desc, doc_id ties) — flags the overflow
    instead of silently dropping it."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        curation.cap_per_group(
            docs.select("doc_id", "source", "n_chars"),
            group_col="source",
            order_col="n_chars",
            cap=120,
        )
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("group_rank").cast("long").alias("group_rank"),
            "kept",
        )
        .orderBy("doc_id")
    )


CAP_PER_SOURCE_SQL = """
SELECT doc_id, source, n_chars,
       CAST(row_number() OVER (PARTITION BY source
                ORDER BY n_chars DESC, doc_id) AS BIGINT) AS group_rank,
       row_number() OVER (PARTITION BY source
                ORDER BY n_chars DESC, doc_id) <= 120 AS kept
FROM documents
ORDER BY doc_id
"""


def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    100 docs with inclusion probability ∝ n_chars, drawn from md5-seeded
    priorities so any engine reproduces the identical sample."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.weighted_sample(
        docs.select("doc_id", "source", "n_chars"),
        key=F.col("doc_id").cast("string"),
        weight=F.col("n_chars"),
        k=100,
    )


SAMPLE_WEIGHTED_SQL = """
WITH p AS (
  SELECT doc_id, source, n_chars,
    ln((CAST(CAST(('0x' || substr(
          md5(CAST(doc_id AS VARCHAR) || '|' || 'ws'), 1, 13))
        AS UBIGINT) AS DOUBLE) + 0.5) / 4503599627370496.0)
    / CAST(n_chars AS DOUBLE) AS pri
  FROM documents
), top AS (
  SELECT doc_id, source, n_chars, pri
  FROM p
  ORDER BY pri DESC, CAST(doc_id AS VARCHAR)
  LIMIT 100
)
SELECT doc_id, source, n_chars,
       ROUND(pri, 6) + 0.0 AS sample_priority
FROM top
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

def curation_token_budget_fill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reproducible token-budget slice: keep documents in deterministic
    md5-priority order while the inclusive running token total fits a
    15k-token budget (≈55% of the sf0.01 corpus — the cutoff genuinely
    bites at every test scale) (``curation.token_budget_fill``) — the shard-sizing
    step before packing. The operator decomposes the global running sum
    into ~256 priority-range prefix sums + per-range parallel windows
    (no single-partition global sort); the oracle runs the NAIVE global
    window, so the hash match proves the decomposition exact."""
    from near_event_streams_spark.operators.text import token_count_regex

    docs = load_table(spark, sf_dir, "documents")
    return curation.token_budget_fill(
        docs,
        budget_tokens=15_000,
        token_col=token_count_regex(F.col("text")),
    )


TOKEN_BUDGET_SQL = """
WITH d AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+'))
              AS BIGINT) AS n_tokens,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                        || '|' || 'tb-v1'), 1, 8))
                   AS UBIGINT) % 1000000000 AS BIGINT) AS pri
  FROM documents
)
SELECT doc_id, n_tokens,
       SUM(n_tokens) OVER (ORDER BY pri, doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= 15000
         AS kept
FROM d ORDER BY doc_id
"""



def drift_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-DRIFT report between two corpus cohorts — the data-
    mixing health check a continuously-ingesting training pipeline runs
    before each mixture refresh: did the recent slice's value
    distribution move against the historic baseline? Orders split at
    1996-01-01; the HISTORIC side's exact price deciles become the bin
    edges; both cohorts are counted into those 10 bins; per-bin shares
    come out in exact integer HALF_UP 6dp arithmetic, plus the signed
    share delta — a PSI-style report with NO logarithms, so every
    column is engine-exact (the ln-based PSI variant would be a
    libm-tolerance row; this one hashes).

    Plan shape: one exact-percentile aggregate over the historic side
    (9 scalars, broadcast), then ONE pass over all orders computing the
    bin index as a codegen sum of (price > edge) comparisons and ONE
    (cohort × 10)-key hash aggregate. No window, no join on data keys;
    at 100 TB it is two scans' worth of work with bounded state."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit("1996-01-01").cast("timestamp_ntz")
    hist = orders.filter(F.col("o_orderdate") < split)
    edges = hist.agg(
        F.percentile(
            F.col("o_totalprice").cast("double"),
            F.lit([i / 10.0 for i in range(1, 10)]),
        ).alias("e")
    )
    price = F.col("o_totalprice").cast("double")
    bin_idx = sum(
        (price > F.element_at(F.col("e"), i + 1)).cast("int")
        for i in range(9)
    )
    binned = (
        orders.crossJoin(F.broadcast(edges))
        .select(
            (F.col("o_orderdate") >= split).alias("is_recent"),
            bin_idx.alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.when(~F.col("is_recent"), 1)).alias("n_hist"),
            F.count(F.when(F.col("is_recent"), 1)).alias("n_recent"),
        )
    )
    tot = binned.agg(
        F.sum("n_hist").alias("t_hist"),
        F.sum("n_recent").alias("t_recent"),
    )
    share_h = half_up6_spark("n_hist", "t_hist")
    share_r = half_up6_spark("n_recent", "t_recent")
    return (
        binned.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("int").alias("bin"),
            "n_hist",
            "n_recent",
            F.expr(share_h).alias("share_hist"),
            F.expr(share_r).alias("share_recent"),
            # operands cast BEFORE the cross-products: the rounding
            # helper casts only the finished num/den expressions, so a
            # raw bigint n_recent*t_hist would overflow once cohort
            # counts pass ~3e9 rows — the 100 TB regime this report
            # exists for
            F.expr(
                half_up_signed_spark(
                    "CAST(n_recent AS DECIMAL(38,0))*t_hist"
                    " - CAST(n_hist AS DECIMAL(38,0))*t_recent",
                    "CAST(t_hist AS DECIMAL(38,0))*t_recent",
                    6,
                )
            ).alias("share_delta"),
        )
        .orderBy("bin")
    )


DRIFT_PRICE_SQL = f"""
WITH edges AS (
  SELECT quantile_cont(CAST(o_totalprice AS DOUBLE),
                       [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS e
  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
), binned AS (
  SELECT CAST((CAST(o_totalprice AS DOUBLE) > e[1]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[2]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[3]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[4]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[5]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[6]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[7]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[8]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[9]) AS INT) AS bin,
       (o_orderdate >= TIMESTAMP '1996-01-01') AS is_recent
  FROM orders, edges
), g AS (
  SELECT bin,
         CAST(COUNT(*) FILTER (WHERE NOT is_recent) AS BIGINT) AS n_hist,
         CAST(COUNT(*) FILTER (WHERE is_recent) AS BIGINT) AS n_recent
  FROM binned GROUP BY 1
), t AS (
  SELECT CAST(SUM(n_hist) AS BIGINT) AS t_hist,
         CAST(SUM(n_recent) AS BIGINT) AS t_recent
  FROM g
)
SELECT CAST(bin AS INT) AS bin, n_hist, n_recent,
       {half_up6_duck("n_hist", "t_hist")} AS share_hist,
       {half_up6_duck("n_recent", "t_recent")} AS share_recent,
       {half_up_signed_duck(
           "CAST(n_recent AS HUGEINT)*t_hist"
           " - CAST(n_hist AS HUGEINT)*t_recent",
           "CAST(t_hist AS HUGEINT)*t_recent", 6)}
         AS share_delta
FROM g, t ORDER BY bin
"""


def drift_psi_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the ln-based drift number monitoring
    stacks actually quote (``drift_price_deciles`` is its exact-
    arithmetic sibling; this one reports the industry-standard
    Σ (p−q)·ln(p/q)). Same two-scan plan: historic deciles → one
    codegen binning pass → one (cohort × 10) hash aggregate. Shares are
    Laplace-smoothed ((n+1)/(t+10)) so empty bins stay finite, and each
    per-bin PSI term is rounded at 12 dp INTO the decimal domain before
    the exact decimal total — the ``text_kl_source_drift`` recipe that
    makes a libm-dependent number hash bit-for-bit across engines (a
    12-dp half-tie on a transcendental is measure-zero; eight rounds
    green on the KL twin). Interpretation gate: PSI < 0.1 stable,
    0.1–0.25 drifting, > 0.25 action — emitted as the usual banded
    label so the report is actionable without a lookup."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit("1996-01-01").cast("timestamp_ntz")
    hist = orders.filter(F.col("o_orderdate") < split)
    edges = hist.agg(
        F.percentile(
            F.col("o_totalprice").cast("double"),
            F.lit([i / 10.0 for i in range(1, 10)]),
        ).alias("e")
    )
    price = F.col("o_totalprice").cast("double")
    bin_idx = sum(
        (price > F.element_at(F.col("e"), i + 1)).cast("int")
        for i in range(9)
    )
    binned = (
        orders.crossJoin(F.broadcast(edges))
        .select(
            (F.col("o_orderdate") >= split).alias("is_recent"),
            bin_idx.alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.when(~F.col("is_recent"), 1)).alias("n_hist"),
            F.count(F.when(F.col("is_recent"), 1)).alias("n_recent"),
        )
    )
    tot = binned.agg(
        F.sum("n_hist").alias("t_hist"),
        F.sum("n_recent").alias("t_recent"),
    )
    # 0..9 bin spine: the Laplace smoothing model is (n+1)/(t+10) over
    # ALL ten bins, so a bin empty in BOTH cohorts must still contribute
    # its smoothing term to the summed PSI (unreachable with historic-
    # decile edges — every bin has hist rows — but the spine keeps the
    # smoothing denominator and the summed terms structurally in
    # agreement when this recipe is reused with external bin edges)
    spine = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    binned = spine.join(
        binned.withColumn("bin", F.col("bin").cast("int")), "bin", "left"
    ).select(
        "bin",
        F.coalesce(F.col("n_hist"), F.lit(0)).cast("long").alias("n_hist"),
        F.coalesce(F.col("n_recent"), F.lit(0))
        .cast("long")
        .alias("n_recent"),
    )
    q = (F.col("n_hist").cast("double") + F.lit(1.0)) / (
        F.col("t_hist").cast("double") + F.lit(10.0)
    )
    p = (F.col("n_recent").cast("double") + F.lit(1.0)) / (
        F.col("t_recent").cast("double") + F.lit(10.0)
    )
    terms = binned.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("int").alias("bin"),
        "n_hist",
        "n_recent",
        F.round((p - q) * F.log(p / q), 12)
        .cast("decimal(26,12)")
        .alias("_term"),
    )
    # total via a GLOBAL window, not a crossJoined scalar aggregate:
    # Catalyst does not dedupe shared subtrees, so the aggregate form
    # would re-execute the whole binning pipeline for the total; the
    # window runs over the post-aggregation frame, which is exactly 10
    # rows by construction — a single-partition window here is free,
    # not the scale smell it would be pre-aggregation
    from pyspark.sql.window import Window as _W

    return (
        terms.withColumn("_psi", F.sum("_term").over(_W.partitionBy()))
        .select(
            "bin",
            "n_hist",
            "n_recent",
            F.col("_term").cast("double").alias("psi_term"),
            F.round(F.col("_psi"), 6).cast("double").alias("psi_total"),
            # band thresholds compared in the DECIMAL domain (DuckDB's
            # 0.1 literal is DECIMAL(2,1); matching that here keeps the
            # comparison exact on both engines)
            F.when(
                F.col("_psi") < F.lit("0.1").cast("decimal(26,12)"),
                "stable",
            )
            .when(
                F.col("_psi") < F.lit("0.25").cast("decimal(26,12)"),
                "drifting",
            )
            .otherwise("action")
            .alias("psi_band"),
        )
        .orderBy("bin")
    )


DRIFT_PSI_SQL = """
WITH edges AS (
  SELECT quantile_cont(CAST(o_totalprice AS DOUBLE),
                       [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS e
  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
), binned AS (
  SELECT CAST((CAST(o_totalprice AS DOUBLE) > e[1]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[2]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[3]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[4]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[5]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[6]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[7]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[8]) AS INT)
       + CAST((CAST(o_totalprice AS DOUBLE) > e[9]) AS INT) AS bin,
       (o_orderdate >= TIMESTAMP '1996-01-01') AS is_recent
  FROM orders, edges
), g AS (
  SELECT bin,
         CAST(COUNT(*) FILTER (WHERE NOT is_recent) AS BIGINT) AS n_hist,
         CAST(COUNT(*) FILTER (WHERE is_recent) AS BIGINT) AS n_recent
  FROM binned GROUP BY 1
), t AS (
  SELECT CAST(SUM(n_hist) AS BIGINT) AS t_hist,
         CAST(SUM(n_recent) AS BIGINT) AS t_recent
  FROM g
), gs AS (
  -- 0..9 bin spine: the (n+1)/(t+10) smoothing model covers ALL ten
  -- bins, so a both-cohort-empty bin still contributes its term
  SELECT s.bin,
         CAST(COALESCE(g.n_hist, 0) AS BIGINT) AS n_hist,
         CAST(COALESCE(g.n_recent, 0) AS BIGINT) AS n_recent
  FROM (SELECT unnest(range(0, 10)) AS bin) s
  LEFT JOIN g ON s.bin = g.bin
), terms AS (
  SELECT bin, n_hist, n_recent,
         CAST(ROUND(
           ((CAST(n_recent AS DOUBLE) + 1.0) / (CAST(t_recent AS DOUBLE) + 10.0)
            - (CAST(n_hist AS DOUBLE) + 1.0) / (CAST(t_hist AS DOUBLE) + 10.0))
           * ln(((CAST(n_recent AS DOUBLE) + 1.0) / (CAST(t_recent AS DOUBLE) + 10.0))
                / ((CAST(n_hist AS DOUBLE) + 1.0) / (CAST(t_hist AS DOUBLE) + 10.0))),
           12) AS DECIMAL(26,12)) AS _term
  FROM gs, t
), total AS (
  SELECT SUM(_term) AS _psi FROM terms
)
SELECT CAST(bin AS INT) AS bin, n_hist, n_recent,
       CAST(_term AS DOUBLE) AS psi_term,
       CAST(ROUND(_psi, 6) AS DOUBLE) AS psi_total,
       CASE WHEN _psi < 0.1 THEN 'stable'
            WHEN _psi < 0.25 THEN 'drifting'
            ELSE 'action' END AS psi_band
FROM terms, total ORDER BY bin
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "decontaminate_train_docs": decontaminate_train_docs,
    "decontaminate_bloom_docs": decontaminate_bloom_docs,
    "decontaminate_overlap_report": decontaminate_overlap_report,
    "sample_weighted_per_source": sample_weighted_per_source,
    "sample_hash_deterministic": sample_hash_deterministic,
    "split_train_val_test": split_train_val_test,
    "curation_token_budget_fill": curation_token_budget_fill,
    "mixture_weighted_sources": mixture_weighted_sources,
    "pack_docs_concat_split": pack_docs_concat_split,
    "pack_docs_next_fit": pack_docs_next_fit,
    "arrow_group_stats": arrow_group_stats,
    "curation_perplexity_buckets": curation_perplexity_buckets,
    "epoch_shuffle_shards": epoch_shuffle_shards,
    "cap_docs_per_source": cap_docs_per_source,
    "sample_weighted_topk": sample_weighted_topk,
    "drift_price_deciles": drift_price_deciles,
    "drift_psi_log": drift_psi_log,
}

ORACLE_SQL: dict[str, str] = {
    "decontaminate_train_docs": DECONTAMINATE_SQL,
    "decontaminate_bloom_docs": DECONTAMINATE_SQL,
    "decontaminate_overlap_report": OVERLAP_REPORT_SQL,
    "sample_weighted_per_source": SAMPLE_WEIGHTED_GROUP_SQL,
    "sample_hash_deterministic": SAMPLE_HASH_SQL,
    "split_train_val_test": SPLIT_TVT_SQL,
    "curation_token_budget_fill": TOKEN_BUDGET_SQL,
    "mixture_weighted_sources": MIXTURE_SQL,
    "pack_docs_concat_split": PACK_CONCAT_SQL,
    "pack_docs_next_fit": PACK_NEXT_FIT_SQL,
    "arrow_group_stats": ARROW_STATS_SQL,
    "curation_perplexity_buckets": CURATION_PERPLEXITY_SQL,
    "epoch_shuffle_shards": EPOCH_SHUFFLE_SQL,
    "cap_docs_per_source": CAP_PER_SOURCE_SQL,
    "sample_weighted_topk": SAMPLE_WEIGHTED_SQL,
    "drift_price_deciles": DRIFT_PRICE_SQL,
    "drift_psi_log": DRIFT_PSI_SQL,
}
