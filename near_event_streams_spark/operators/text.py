"""Text-analysis operators: quality scoring, token counting, language ID,
document fingerprinting. All built-in expressions (no UDFs) — the whole
family runs inside whole-stage codegen and scales as a narrow map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from near_event_streams_spark.operators.dedup import words_col

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

# deterministic marker lists for the language-ID heuristic; ties resolve in
# this declaration order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("de", "le", "shi"),
}


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words_col(text))


TOKEN_REGEX = "[a-z]+|[0-9]+"


def token_count_regex(text: Column) -> Column:
    """BPE-ish token count: alpha runs + digit runs."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_REGEX), 0))


def vocabulary(
    docs: DataFrame, top_k: int = 200, text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary with term/document frequency — the tokenizer-
    vocab-building pass of an LLM data pipeline.

    One explode + one hash aggregation; tf is a plain count, df counts
    distinct docs per term via the (term, doc) pre-distinct (two shuffles
    total, both on the term key). Top-k by (tf desc, term) is a
    TakeOrdered, not a global sort.
    """
    terms = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0
            )
        ).alias("term"),
    )
    stats = (
        terms.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
    )
    return (
        stats.orderBy(F.desc("tf"), F.asc("term"))
        .limit(top_k)
        .select("term", "tf", "df")
    )


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-doc quality features + a boolean keep-gate.

    Mirrors the heuristics common in LLM-corpus cleaning (length bounds,
    stopword density, mean word length).
    """
    words = words_col(F.col("text"))
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    total_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*STOPWORDS))
    )
    avg_word_len = F.round(
        total_chars.cast("double") / n_words.cast("double"), 6
    )
    stop_ratio = F.round(
        n_stop.cast("double") / n_words.cast("double"), 6
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        avg_word_len.alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        (
            (n_words >= 5)
            & (n_words <= 10000)
            & (n_distinct.cast("double") / n_words.cast("double") > 0.2)
        ).alias("keep"),
    )


def lang_scores(text: Column) -> dict[str, Column]:
    words = words_col(F.lower(text))
    return {
        lang: F.size(F.filter(words, lambda w: w.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: argmax of per-language marker hits with
    deterministic tie-break in LANG_MARKERS declaration order."""
    scores = lang_scores(F.col("text"))
    langs = list(scores)
    pred = F.lit(langs[-1])
    best = scores[langs[-1]]
    # fold right-to-left so earlier languages win ties (>=)
    for lang in reversed(langs[:-1]):
        cond = scores[lang] >= best
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, scores[lang]).otherwise(best)
    out = docs.select(
        "doc_id",
        "lang",
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        pred.alias("pred_lang"),
    )
    return out.withColumn("lang_match", F.col("pred_lang") == F.col("lang"))


def repetition_features(docs: DataFrame) -> DataFrame:
    """Repetition / character-composition quality signals in the style of
    the Gopher and C4 cleaning rules: dominance of the most frequent
    term, digit-character ratio, whitespace-character ratio, plus the
    composite keep-gate.

    All higher-order array expressions — per-term counting is
    transform-over-distinct-terms (quadratic in doc length but JVM-side
    and row-local, the right trade below ~10k tokens; the vocabulary()
    aggregation path is the shuffle alternative for giant docs).
    """
    # the token array is materialized as its own column: an inline
    # regexp_extract_all captured by the transform/filter lambdas would
    # be re-evaluated per distinct term — O(terms) regex extractions on
    # top of the already-quadratic per-term count (the word_bigrams
    # higher-order-function trap, operators/dedup.py)
    toks = F.col("_toks")
    docs = docs.withColumn(
        "_toks",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_REGEX), 0),
    )
    n_toks = F.size(toks)
    top_count = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    n_chars = F.length("text")
    n_digit = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    n_space = F.length(F.regexp_replace(F.col("text"), r"[^\s]", ""))
    top_ratio = F.round(
        top_count.cast("double") / n_toks.cast("double"), 6
    )
    digit_ratio = F.round(
        n_digit.cast("double") / n_chars.cast("double"), 6
    )
    space_ratio = F.round(
        n_space.cast("double") / n_chars.cast("double"), 6
    )
    return docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        top_ratio.alias("top_term_ratio"),
        digit_ratio.alias("digit_char_ratio"),
        space_ratio.alias("space_char_ratio"),
        (
            (top_ratio <= 0.2)
            & (digit_ratio <= 0.3)
            & (space_ratio <= 0.35)
        ).alias("keep"),
    )


EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\+[0-9]-[0-9]{3}-[0-9]{4}"


def scrub_pii(text: Column) -> Column:
    """Redact emails then phone numbers with typed placeholder tokens —
    the PII-scrub pass of a training pipeline. Plain regexp_replace:
    narrow, codegen'd, no UDF."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in ``text``."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)),
    )


def rolling_fingerprint(text: Column, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over characters (base 31, mod 1e9+7) —
    the classic document fingerprint, computed as a fold so it stays
    JVM-side. Oracle-gated: DuckDB replays the identical fold via
    ``list_reduce`` over per-character codepoints (TEXT_FINGERPRINT_SQL
    in plans/llm_ops.py)."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % mod,
    )


def chunk_documents(
    docs,
    chunk_size: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Sliding-window token chunking — the context-window prep step of a
    training pipeline: each doc becomes ⌈(n−overlap)/(size−overlap)⌉
    chunks of ``chunk_size`` whitespace tokens overlapping by
    ``overlap``.

    Pure column-expression implementation (sequence → transform → slice →
    posexplode): no UDF, no shuffle — chunking is row-local, so it scales
    as a narrow map over however many partitions the corpus has.
    """
    from pyspark.sql import functions as F

    step = chunk_size - overlap
    if step <= 0:
        raise ValueError("chunk_size must exceed overlap")
    # materialized words column — an inline split captured by the chunk
    # transform's slice would re-run the regex per chunk (the
    # word_bigrams trap, operators/dedup.py)
    words = F.col("_chunk_words")
    docs = docs.withColumn(
        "_chunk_words", F.split(F.trim(F.col(text_col)), r"\s+")
    )
    n = F.size(words)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(step)).cast(
            "int"
        ),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.array_join(
                F.slice(words, i * step + 1, chunk_size), " "
            ).alias("chunk_text"),
            F.least(n - i * step, F.lit(chunk_size)).alias("n_tokens"),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_id", "c"),
    ).select(
        "doc_id",
        "chunk_id",
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


def bm25_rank(
    docs: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = 1000,
) -> DataFrame:
    """BM25 top-k document retrieval against a bag of query terms — the
    scorer a corpus-search / hard-negative-mining pipeline runs over the
    training set.

    Plan shape at 100 TB: tokenize + term-filter is a narrow map (the
    query's term list folds into an ``isin`` literal); per-(doc, term)
    tf is one hash aggregation; the df/N/avgdl corpus statistics are
    tiny aggregates that broadcast back; the final score is one more
    hash aggregation on ``doc_id``. Ranking is two-phase: an
    ``orderBy(...).limit(top_k)`` plans as TakeOrderedAndProject
    (per-partition top-k, then a k-row merge on one task — never a full
    sort, never an unpartitioned window over all matched docs), and the
    row_number window then runs over at most ``top_k`` rows. With a
    high-df query term over a 100 TB corpus the matched set is
    unbounded; only the bounded k-row head ever funnels through a
    single task. ``top_k=None`` ranks every matched doc through one
    unpartitioned window — correct, but a single-executor bottleneck at
    scale; reserve it for small corpora.

    Uses the Lucene positive-idf variant ``ln(1 + (N - df + .5)/(df + .5))``.
    Scores round to 6 dp so the DuckDB oracle hash-matches (sum order
    across <=len(terms) doubles differs by ~1e-15 at worst).
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count_ws(F.col(text_col)).cast("double").alias("dl"),
        F.explode(words_col(F.lower(F.col(text_col)))).alias("term"),
    )
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(token_count_ws(F.col(text_col))).alias("avgdl"),
    )
    matched = toks.filter(F.col("term").isin(*terms))
    tf = matched.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.first("dl").alias("dl"),
    )
    df_ = matched.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.round(F.sum("w"), 6).alias("bm25"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )
    ranked = per_doc
    if top_k is not None:
        ranked = ranked.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(top_k)
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return ranked.withColumn("rank", F.row_number().over(w))


def lm_bigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Character-bigram language-model score per document — the
    perplexity-style quality signal (KenLM-filtering's little sibling):
    documents whose character transitions are unlikely under the corpus
    LM (gibberish, wrong-language, boilerplate) score low.

    The LM is the corpus itself: P(c2 | c1) = count(c1c2) / count(c1·),
    estimated from ALL documents, then each document is scored by the
    mean log-probability of its own bigrams. The bigram table is at most
    |alphabet|² rows no matter the corpus size, so both model joins
    broadcast; the only shuffle is the bigram-count aggregation. Scores
    round to 6 dp for the cross-engine oracle.
    """
    # normalized text materialized as its own column: an inline
    # lower(trim(...)) captured by the transform lambda would be
    # re-evaluated (full string copy) once per character — O(len²)
    # (the word_bigrams trap, operators/dedup.py)
    norm = F.col("_norm")
    # guarded: sequence(1, 0) would DESCEND for sub-2-char texts
    idx = F.when(
        F.length(norm) >= 2, F.sequence(F.lit(1), F.length(norm) - 1)
    ).otherwise(F.array().cast("array<int>"))
    bigrams = docs.withColumn(
        "_norm", F.lower(F.trim(F.col(text_col)))
    ).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(idx, lambda i: norm.substr(i, F.lit(2)))
        ).alias("bigram"),
    )
    model = (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("bg_count"))
        .withColumn("prefix", F.substring("bigram", 1, 1))
    )
    prefix = model.groupBy("prefix").agg(
        F.sum("bg_count").alias("pf_count")
    )
    model = model.join(F.broadcast(prefix), "prefix").select(
        "bigram",
        (
            F.log(
                F.col("bg_count").cast("double")
                / F.col("pf_count").cast("double")
            )
        ).alias("logp"),
    )
    return (
        bigrams.join(F.broadcast(model), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("logp"), 6).alias("avg_logprob"),
        )
    )


def nb_quality_distill(
    docs: DataFrame,
    teacher: DataFrame,
    buckets: int = 4096,
    salt: str = "clf",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-classifier distillation: train a hashed naive-Bayes text
    classifier on a heuristic teacher label and score the whole corpus —
    the fastText-style step real pipelines use to generalize a cheap
    rule (Gopher gates, wiki-vs-crawl seeds) into a smooth per-doc score.

    ``teacher`` is any ``(doc_id, label boolean)`` frame (typically
    ``repetition_features(...).select("doc_id", "keep")``). Tokens hash
    into ``buckets`` feature slots via the engine-portable md5 bucket
    (same scheme as ``curation.hash_bucket``) — the hashing trick keeps
    the model size FIXED at ``buckets`` rows no matter the corpus, so
    the weight table broadcasts at any scale. Per-slot class counts get
    add-one smoothing; a doc's score is the class-prior log-odds plus
    the mean per-token weight.

    Plan shape at 100 TB: tokenize is a narrow map; ONE shuffle on the
    bounded bucket key builds the model; totals are single-row
    aggregates (broadcast); scoring re-joins the 4096-row weight table
    broadcast onto the token stream and reduces per doc (one doc_id
    shuffle). The teacher join is doc-keyed equi. No unbounded state,
    no pair joins.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0
            )
        ).alias("w"),
    )
    hexpart = F.substring(
        F.md5(F.concat_ws("|", F.col("w"), F.lit(salt))), 1, 8
    )
    tok = tok.select(
        "doc_id", (F.conv(hexpart, 16, 10).cast("long") % buckets).alias("bucket")
    )
    lab = teacher.select("doc_id", F.col("label").alias("label"))
    tl = tok.join(lab, "doc_id")
    cls = tl.groupBy("bucket").agg(
        F.count(F.when(F.col("label"), 1)).alias("c_pos"),
        F.count(F.when(~F.col("label"), 1)).alias("c_neg"),
    )
    tot = tl.agg(
        F.count(F.when(F.col("label"), 1)).alias("n_pos"),
        F.count(F.when(~F.col("label"), 1)).alias("n_neg"),
    )
    dtot = lab.agg(
        F.count(F.when(F.col("label"), 1)).alias("d_pos"),
        F.count(F.when(~F.col("label"), 1)).alias("d_neg"),
    )
    weights = cls.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log(
                (F.col("c_pos") + 1.0).cast("double")
                / (F.col("n_pos") + float(buckets))
            )
            - F.log(
                (F.col("c_neg") + 1.0).cast("double")
                / (F.col("n_neg") + float(buckets))
            )
        ).alias("weight"),
    )
    # Partial teachers are the normal distillation setup: buckets no
    # training token ever hit get the add-one-smoothed zero-count weight
    # log(1/(n_pos+B)) - log(1/(n_neg+B)) rather than silently dropping
    # the token, and docs outside the teacher still get scored (null
    # label/agree) rather than disappearing.
    default_w = F.log(
        F.lit(1.0) / (F.col("n_pos") + float(buckets))
    ) - F.log(F.lit(1.0) / (F.col("n_neg") + float(buckets)))
    scored = (
        tok.join(F.broadcast(weights), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id", F.coalesce(F.col("weight"), default_w).alias("weight")
        )
        .groupBy("doc_id")
        .agg(
            F.avg("weight").alias("avg_w"),
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
        )
    )
    prior = F.log(
        (F.col("d_pos") + 1.0).cast("double") / (F.col("d_neg") + 1.0)
    )
    out = (
        scored.crossJoin(F.broadcast(dtot))
        .join(lab, "doc_id", "left")
        .withColumn("clf_score", F.round(prior + F.col("avg_w"), 6))
        .withColumn("clf_pred", (prior + F.col("avg_w")) > 0)
    )
    return out.select(
        "doc_id",
        "label",
        "n_tokens",
        "clf_score",
        "clf_pred",
        (F.col("clf_pred") == F.col("label")).alias("agree"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-N terms per document by smoothed TF-IDF — the per-doc keyword
    signal used for topic tagging, clustering features and near-dup
    triage.

    Plan shape at 100 TB: tf is one hash agg on (doc, term); df is one
    on term; the doc count is a broadcast scalar. The df table is
    vocabulary-sized and therefore NOT hinted broadcast — the tf←df join
    stays a key-equi shuffle join that AQE may downgrade to broadcast
    when the vocab is small. Ranking is a window PARTITIONED BY doc —
    per-doc groups, no global ordering. Scores round to 6 dp before
    ranking so rank ties resolve identically cross-engine (term asc).
    """
    from pyspark.sql.window import Window

    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0
            )
        ).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df_ = terms.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf_count"),
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= top_n)
        .select("doc_id", "term_rank", "term", "tf_count", "tfidf")
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-word collocations by pointwise mutual information —
    the phrase-mining pass (think "new york", "machine learning") over a
    training corpus.

    PMI(x,y) = ln( P(xy) / (P(x)·P(y)) ) with bigram/unigram MLE counts.
    Plan shape at 100 TB: unigram and bigram counts are each one hash
    agg; the two totals are broadcast scalars; the pair←unigram joins
    are key-equi on the words (the unigram table is vocabulary-sized, so
    no forced broadcast). The final top-k is TakeOrdered, never a global
    sort. ``min_count`` prunes the hapax tail before the joins.
    """
    from near_event_streams_spark.operators.dedup import (
        word_bigrams,
        words_col,
    )

    toks = docs.select(
        words_col(F.lower(F.col(text_col))).alias("ws")
    )
    uni = (
        toks.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    t_uni = uni.agg(F.sum("c").alias("t_uni"))
    bi = (
        toks.select(F.explode(word_bigrams(F.col("ws"))).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("double").alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
        .withColumn("x", F.split("bg", " ")[0])
        .withColumn("y", F.split("bg", " ")[1])
    )
    t_bi = (
        toks.select(F.size(word_bigrams(F.col("ws"))).alias("n"))
        .agg(F.sum("n").cast("double").alias("t_bi"))
    )
    joined = (
        bi.join(uni.select(F.col("w").alias("x"), F.col("c").alias("c_x")), "x")
        .join(uni.select(F.col("w").alias("y"), F.col("c").alias("c_y")), "y")
        .crossJoin(F.broadcast(t_uni))
        .crossJoin(F.broadcast(t_bi))
    )
    pmi = F.round(
        F.log(
            (F.col("c_xy") / F.col("t_bi"))
            / ((F.col("c_x") / F.col("t_uni")) * (F.col("c_y") / F.col("t_uni")))
        ),
        6,
    )
    return (
        joined.select(
            "x",
            "y",
            F.col("c_xy").cast("long").alias("pair_count"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("x"), F.asc("y"))
        .limit(top_k)
    )


def encode_token_ids(
    docs: DataFrame,
    vocab_size: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-id encoding against a corpus-derived vocabulary — the final
    text→ids step before sequence packing. Vocabulary = top
    ``vocab_size`` terms by (tf desc, term asc), ids 1..V in that order;
    out-of-vocabulary tokens encode as UNK id 0.

    Plan shape at 100 TB: the vocab is BOUNDED at ``vocab_size`` rows by
    construction (TakeOrdered + a window over those k rows only), so the
    encode join broadcasts no matter the corpus size; reassembly is one
    hash agg on doc_id. The id list serializes with ``concat_ws`` (the
    driver canon requires scalar cells).
    """
    from pyspark.sql.window import Window

    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0
            )
        ).alias("pos", "term"),
    )
    vocab = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(vocab_size)
    )
    # ranking k rows: bounded input, the single-partition window is fine
    vw = Window.orderBy(F.desc("tf"), F.asc("term"))
    vocab_ids = vocab.select(
        "term", F.row_number().over(vw).cast("long").alias("token_id")
    )
    encoded = terms.join(F.broadcast(vocab_ids), "term", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("token_id"), F.lit(0)).alias("token_id"),
    )
    pieces = F.array_sort(F.collect_list(F.struct("pos", "token_id")))
    return (
        encoded.groupBy("doc_id")
        .agg(pieces.alias("pieces"))
        .select(
            "doc_id",
            F.size("pieces").cast("long").alias("n_tokens"),
            F.size(
                F.filter(F.col("pieces"), lambda p: p["token_id"] == 0)
            ).cast("long").alias("n_unk"),
            F.concat_ws(
                ",",
                F.transform(
                    F.col("pieces"), lambda p: p["token_id"].cast("string")
                ),
            ).alias("token_ids"),
        )
    )


def kl_source_drift(
    docs: DataFrame,
    vocab_size: int = 512,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distribution-shift audit: smoothed KL divergence between each
    group's token distribution and the whole-corpus distribution over
    the corpus top-``vocab_size`` vocabulary — the drift signal a
    pipeline watches across crawl snapshots / domains (a source whose
    KL jumps is the one whose content changed).

    ``KL(p_g ‖ q) = Σ_v p_g(v)·ln(p_g(v)/q(v))`` with add-one smoothing
    on both sides so vocabulary terms absent from a group contribute
    finitely. Returns ``(source, n_tokens, kl_divergence)``.

    Plan shape at 100 TB: one (group, term) count aggregate over the
    token stream, PERSISTED — three derived aggregates (corpus counts,
    vocabulary, group totals) consume it and Catalyst does NOT dedupe
    the common subtree across them (measured: zero ReusedExchange),
    so without the persist the token stream would be scanned and
    aggregated three times. The vocabulary is bounded at
    ``vocab_size`` rows by construction so the per-group × vocab frame
    is |groups|·V rows — tiny — built by a broadcast cross join, never
    touching the token stream again. The persist handle is
    caller-owned (``spark.catalog.clearCache()`` when done — repo
    convention). Cross-engine determinism: counts are exact integers,
    each KL term rounds to 12 dp and sums as exact DECIMAL(26,12)
    (float-sum order dependence cannot leak in), final value rounds
    to 6 dp.
    """
    terms = docs.select(
        F.col(group_col).alias("source"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0
            )
        ).alias("term"),
    )
    gcounts = (
        terms.groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    ccounts = gcounts.groupBy("term").agg(F.sum("c").alias("ctf"))
    vocab = ccounts.orderBy(F.desc("ctf"), F.asc("term")).limit(vocab_size)
    gtotals = gcounts.groupBy("source").agg(
        F.sum("c").alias("g_total")
    )
    ctotal = ccounts.agg(F.sum("ctf").alias("c_total"))
    v = float(vocab_size)
    grid = (
        gtotals.crossJoin(F.broadcast(vocab))
        .join(
            gcounts.join(F.broadcast(vocab.select("term")), "term"),
            ["source", "term"],
            "left",
        )
        .crossJoin(F.broadcast(ctotal))
    )
    p = (F.coalesce(F.col("c"), F.lit(0)) + 1.0).cast("double") / (
        F.col("g_total") + v
    )
    q = (F.col("ctf") + 1.0).cast("double") / (F.col("c_total") + v)
    term_kl = F.round(p * F.log(p / q), 12).cast("decimal(26,12)")
    return (
        grid.groupBy("source", "g_total")
        .agg(F.sum(term_kl).alias("_kl"))
        .select(
            "source",
            F.col("g_total").alias("n_tokens"),
            # round in the DECIMAL domain then cast: both engines
            # tie-break decimal HALF_UP identically, while ROUND on the
            # cast double diverges on 7th-digit-5 ties (r6 rfm class)
            F.round(F.col("_kl"), 6).cast("double").alias(
                "kl_divergence"
            ),
        )
        .orderBy("source")
    )


def bpe_merge_fold(sym_col, left: str, right: str, merged: str):
    """Greedy left-to-right application of ONE merge to a symbol array
    — the JVM array fold shared by the trainer loop
    (:func:`bpe_learn_merges`) and the encoder
    (:func:`bpe_apply_counts`), so the two cannot drift. Mirrored in
    SQL by ``list_reduce`` over singleton-lifted symbols."""
    la, lb, lab = F.lit(left), F.lit(right), F.lit(merged)
    return F.aggregate(
        F.col(sym_col) if isinstance(sym_col, str) else sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - F.lit(1)),
                F.array(lab),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn byte-pair-encoding merges from the corpus — the actual
    tokenizer-training loop (Sennrich et al. 2016), not the BPE-ish
    regex approximation used for token counting.

    The distributed shape every large-scale BPE trainer uses: the
    corpus is touched ONCE to build the word-frequency table (one
    shuffle); the merge loop then runs entirely on that bounded,
    vocabulary-sized table — per iteration one adjacent-pair count
    aggregate (weighted by word frequency), a TakeOrdered-1 for the
    best pair (ties to the lexicographically smallest, so the merge
    sequence is fully deterministic), and a narrow array-fold applying
    the merge greedily left-to-right. Only the single best-pair row
    ever reaches the driver per iteration.

    Returns ``(iteration, left, right, merged, pair_count)`` —
    ``n_merges`` rows describing the learned merge table in order.
    """
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.split("w", "").alias("sym"), "freq")
        # merge loop input; lineage root. LAZY local checkpoint (r17):
        # the first pair-count job materializes it — same truncation,
        # one fewer job
        .localCheckpoint(eager=False)
    )
    out_rows = []
    for it in range(1, n_merges + 1):
        pairs = (
            words.select(
                "freq",
                F.explode(
                    F.when(
                        F.size("sym") >= 2,
                        F.zip_with(
                            F.slice(
                                "sym", 1, F.size("sym") - F.lit(1)
                            ),
                            F.slice("sym", 2, F.size("sym") - F.lit(1)),
                            lambda a, b: F.struct(
                                a.alias("l"), b.alias("r")
                            ),
                        ),
                    ).otherwise(
                        F.array().cast(
                            "array<struct<l:string,r:string>>"
                        )
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(
            F.desc("cnt"), F.asc("p.l"), F.asc("p.r")
        ).limit(1).collect()
        if not best:
            break
        left, right, cnt = (
            best[0]["p"]["l"],
            best[0]["p"]["r"],
            best[0]["cnt"],
        )
        merged = left + right
        out_rows.append((it, left, right, merged, cnt))
        # r17: LAZY local checkpoint — still truncates lineage (each
        # iteration's plan reads the previous checkpoint, never the
        # re-derived corpus scan), but materialization folds into the
        # NEXT iteration's pair-count job instead of being its own
        # eager job: n_merges+1 jobs total instead of 2·n_merges, and
        # the final iteration's fold (consumed by no one) never runs
        words = words.select(
            bpe_merge_fold("sym", left, right, merged).alias("sym"),
            "freq",
        ).localCheckpoint(eager=False)
    spark = docs.sparkSession
    return spark.createDataFrame(
        out_rows,
        "iteration int, left string, right string, "
        "merged string, pair_count bigint",
    ).orderBy("iteration")


def bpe_apply_counts(
    docs: DataFrame,
    merges: list[tuple[str, str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Encode the corpus with a learned BPE merge table and return
    per-doc ``(doc_id, n_words, n_chars, n_bpe_tokens)`` — the
    tokenizer-APPLY path that budgets context windows once training
    (:func:`bpe_learn_merges`) has produced the table.

    Vocabulary-shaped, the only sane 100 TB encode plan: the merge
    folds run once per DISTINCT word (bounded vocabulary), never per
    corpus token — documents then join the encoded vocab on the word
    key and reduce per doc. Applying k merges is k chained
    :func:`bpe_merge_fold` expressions in learned order, exactly the
    trainer's fold, so encode and train agree symbol-for-symbol.

    ``merges``: ``(left, right, merged)`` triples in merge order —
    pass ``[(r.left, r.right, r.merged) for r in
    bpe_learn_merges(...).collect()]`` (k rows — the bounded
    merge-table collect, same contract as the trainer loop).
    """
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0
            )
        ).alias("w"),
    )
    vocab = toks.select("w").distinct().select(
        "w", F.split("w", "").alias("sym")
    )
    for left, right, merged in merges:
        vocab = vocab.select(
            "w", bpe_merge_fold("sym", left, right, merged).alias("sym")
        )
    vocab = vocab.select(
        "w", F.length("w").alias("n_char"), F.size("sym").alias("n_sym")
    )
    return (
        toks.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_char").alias("n_chars"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    buckets: int = 4096,
    salt: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", arXiv:2302.03169):
    hashed-n-gram bag-of-words likelihood ratio between a TARGET
    distribution (the domain you want more of) and the RAW pool — the
    per-doc ``importance`` is the sum of per-token log-ratios, the
    quantity DSIR resamples by.

    Same fixed-size hashing trick as :func:`nb_quality_distill`: both
    unigram models live in ``buckets`` rows regardless of corpus size,
    so the weight table broadcasts; scoring is one doc-keyed reduce.
    Add-one smoothing on both sides keeps never-seen buckets finite.
    Returns ``(doc_id, n_tokens, importance)`` over the raw pool.
    """

    def tok(df: DataFrame) -> DataFrame:
        t = df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0
                )
            ).alias("w"),
        )
        hexpart = F.substring(
            F.md5(F.concat_ws("|", F.col("w"), F.lit(salt))), 1, 8
        )
        return t.select(
            "doc_id",
            (F.conv(hexpart, 16, 10).cast("long") % buckets).alias(
                "bucket"
            ),
        )

    raw_tok = tok(docs)
    tgt_counts = (
        tok(target)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    raw_counts = raw_tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr")
    )
    totals = F.broadcast(
        tgt_counts.agg(F.sum("ct").alias("nt")).crossJoin(
            raw_counts.agg(F.sum("cr").alias("nr"))
        )
    )
    weights = (
        raw_counts.join(F.broadcast(tgt_counts), "bucket", "full_outer")
        .crossJoin(totals)
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1.0).cast(
                        "double"
                    )
                    / (F.col("nt") + float(buckets))
                )
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)) + 1.0).cast(
                        "double"
                    )
                    / (F.col("nr") + float(buckets))
                )
            ).alias("w"),
        )
    )
    # per-token weights round to 12 dp and sum as exact decimals so the
    # per-doc importance is order- and engine-exact
    summand = F.round(F.col("w"), 12).cast("decimal(26,12)")
    return (
        raw_tok.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            # decimal-domain round (see kl_drift): tie-exact cross-engine
            F.round(F.sum(summand), 6).cast("double").alias(
                "importance"
            ),
        )
    )


def source_token_entropy(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Shannon entropy of each group's token distribution (plus token
    and vocabulary counts) — the lexical-diversity profile that pairs
    with :func:`kl_source_drift`: low-entropy sources are templated or
    repetitive, entropy collapsing across snapshots signals generation
    loops or scraper breakage.

    One (group, term) count aggregate (persisted — the totals
    re-aggregate it and Catalyst does not dedupe the shared subtree),
    then per-term contributions ``-p·ln p`` rounded to 12 dp summed as
    exact decimals per group. Returns
    ``(source, n_tokens, vocab_size, entropy)``.
    """
    terms = docs.select(
        F.col(group_col).alias("source"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0
            )
        ).alias("term"),
    )
    gcounts = (
        terms.groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    gtotals = gcounts.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
    )
    p = F.col("c").cast("double") / F.col("n_tokens").cast("double")
    contrib = F.round(-p * F.log(p), 12).cast("decimal(26,12)")
    return (
        gcounts.join(F.broadcast(gtotals), "source")
        .groupBy("source", "n_tokens", "vocab_size")
        .agg(F.sum(contrib).alias("_h"))
        .select(
            "source",
            "n_tokens",
            "vocab_size",
            # decimal-domain round (see kl_drift): tie-exact cross-engine
            F.round(F.col("_h"), 6).cast("double").alias("entropy"),
        )
        .orderBy("source")
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition signals (the Gopher repetition rules'
    mechanics): the fraction of word TRIGRAM occurrences that belong to
    a trigram repeated inside the SAME document, and the share of
    bigram occurrences claimed by the document's single most frequent
    bigram. High values flag boilerplate/listicle/SEO-spam docs that
    cross-document dedup structurally misses (the duplication is
    internal). Distinct from ``duplicated_ngram_stats``, which measures
    ACROSS-document duplication.

    Shape: one generate (tagged bigram+trigram explode) → one
    (doc, kind, gram) count → one (doc, kind) reduce folded to columns
    by conditional aggregation — two keyed shuffles total, linear in
    corpus token count. Ratios round via the engine-exact integer
    HALF_UP helper."""
    from near_event_streams_spark.functions.rounding import half_up6_spark

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0
    )
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("w"))
    n = F.size("w")

    def grams(k: int):
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at("w", i + j) for j in range(k)],
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    tagged = base.select(
        "doc_id", F.lit("b").alias("kind"), F.explode(grams(2)).alias("g")
    ).unionByName(
        base.select(
            "doc_id", F.lit("t").alias("kind"), F.explode(grams(3)).alias("g")
        )
    )
    per_gram = tagged.groupBy("doc_id", "kind", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_kind = per_gram.groupBy("doc_id", "kind").agg(
        F.sum("c").alias("total"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("rep"),
        F.max("c").alias("mx"),
    )
    folded = per_kind.groupBy("doc_id").agg(
        F.max(F.when(F.col("kind") == "t", F.col("total"))).alias("tri_total"),
        F.max(F.when(F.col("kind") == "t", F.col("rep"))).alias("tri_rep"),
        F.max(F.when(F.col("kind") == "b", F.col("total"))).alias("bi_total"),
        F.max(F.when(F.col("kind") == "b", F.col("mx"))).alias("bi_mx"),
    )
    zero = F.lit(0).cast("long")
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(folded, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("tri_total", zero).alias("n_trigrams"),
            F.coalesce("tri_rep", zero).alias("n_repeated_trigrams"),
            F.when(
                F.coalesce("tri_total", zero) > 0,
                F.expr(
                    half_up6_spark(
                        "coalesce(tri_rep, 0L)", "tri_total"
                    )
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("tri_rep_fraction"),
            F.when(
                F.coalesce("bi_total", zero) > 0,
                F.expr(
                    half_up6_spark("coalesce(bi_mx, 0L)", "bi_total")
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_share"),
        )
        .orderBy("doc_id")
    )
