"""Deduplication operators for large-scale training-data pipelines.

Five strategies, each a composable DataFrame transform:

* **exact** — hash group-by on the raw or normalized text.
* **fingerprint** — MD5 of a normalized prefix key (cheap blocking).
* **n-gram Jaccard** — word-shingle inverted index self-join; exact
  similarity on candidate pairs. O(pairs sharing a shingle) — at 100 TB
  this needs the LSH variant below to bound candidates, which is why both
  exist.
* **MinHash + LSH** — per-doc minhash signature (k independent hash
  slots via seeded xxhash64), banded into buckets; only same-bucket pairs
  are verified with exact Jaccard. Candidate generation is
  O(docs × bands) with a shuffle on (band, bucket-hash) — the 100 TB
  scale path.
* **SimHash** — 16-bit signed-bit-vote signature over word hashes;
  banded for candidate pairs, verified by Hamming distance.

All hashing is Spark-native ``xxhash64`` (JVM, codegen) — deterministic
across runs/partitionings, so results are reproducible cluster-wide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared tokenization (must stay in lockstep with the DuckDB oracle SQL in
# plans/llm_ops.py)
# ---------------------------------------------------------------------------


def words_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def word_bigrams(words: Column) -> Column:
    """Adjacent word pairs, 1-based element_at (matches DuckDB w[i]||' '||w[i+1]);
    guarded because sequence(1,0) would produce a DESCENDING sequence."""
    return F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat(
                F.element_at(words, i), F.lit(" "), F.element_at(words, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word-bigram shingles per document."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_bigrams(words_col(F.col(text_col)))).alias(
                "shingle"
            ),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# exact + fingerprint
# ---------------------------------------------------------------------------


def dedup_exact(
    docs: DataFrame, key: Column, id_col: str = "doc_id"
) -> DataFrame:
    """Group by an exact key; keep min-id representative + group size."""
    return docs.groupBy(key.alias("dedup_key")).agg(
        F.min(id_col).alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def normalized_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint_prefix(text: Column, n_words: int = 5) -> Column:
    """MD5 of the first-N-words normalized prefix — a cheap blocking key."""
    return F.md5(
        F.array_join(F.slice(words_col(normalized_text(text)), 1, n_words), " ")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted-index join)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    shingles: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """All doc pairs with shingle-set Jaccard ≥ threshold.

    inverted-index self-join on shingle (shuffle on shingle), partial
    count per pair, then a broadcast join against per-doc sizes. Output:
    (a_doc_id, b_doc_id, jaccard) with a < b, jaccard rounded to 6dp.
    """
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_doc_id"),
            F.col("b.doc_id").alias("b_doc_id"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("a_doc_id"), F.col("sz").alias("sz_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("b_doc_id"), F.col("sz").alias("sz_b")
    )
    jac = F.round(
        F.col("inter").cast("double")
        / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        6,
    )
    return (
        inter.join(F.broadcast(sa), "a_doc_id")
        .join(F.broadcast(sb), "b_doc_id")
        .select("a_doc_id", "b_doc_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------------


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """k minhash slots per doc: slot j = min over shingles of
    xxhash64(j-salted shingle). One shuffle (groupBy doc_id); each slot is
    a map-side partial min."""
    aggs = [
        F.min(
            F.xxhash64(F.concat(F.lit(f"mh{j}|"), F.col("shingle")))
        ).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 16, band_size: int = 4
) -> DataFrame:
    """Band the signature; docs sharing any (band, band-hash) bucket become
    candidate pairs. Shuffle is on the bucket key — bounded fan-out, no
    all-pairs blow-up."""
    n_bands = num_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"h{j}") for j in range(b * band_size, (b + 1) * band_size)]
        bands.append(
            signatures.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.xxhash64(*cols).alias("bucket"),
            )
        )
    buckets = bands[0]
    for extra in bands[1:]:
        buckets = buckets.unionByName(extra)
    a = buckets.alias("a")
    b2 = buckets.alias("b")
    return (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_doc_id"),
            F.col("b.doc_id").alias("b_doc_id"),
        )
        .distinct()
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """Full pipeline: shingle → minhash → LSH buckets → exact-Jaccard verify
    of candidates only. Returns verified (a_doc_id, b_doc_id, jaccard)."""
    sh = doc_shingles(docs)
    cands = lsh_candidate_pairs(
        minhash_signatures(sh, num_hashes), num_hashes, band_size
    )
    # verify candidates with exact jaccard: join candidate pairs back to
    # shingle sets (shuffle bounded by candidate count, not all pairs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a_sh = sh.select(F.col("doc_id").alias("a_doc_id"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("b_doc_id"), "shingle")
    inter = (
        cands.join(a_sh, "a_doc_id")
        .join(b_sh, ["b_doc_id", "shingle"])
        .groupBy("a_doc_id", "b_doc_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.round(
        F.col("inter").cast("double")
        / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        6,
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("doc_id").alias("a_doc_id"),
                    F.col("sz").alias("sz_a"),
                )
            ),
            "a_doc_id",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("doc_id").alias("b_doc_id"),
                    F.col("sz").alias("sz_b"),
                )
            ),
            "b_doc_id",
        )
        .select("a_doc_id", "b_doc_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(docs: DataFrame, bits: int = 16) -> DataFrame:
    """Signed-bit-vote simhash over distinct words (xxhash64 word hashes)."""
    tokens = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("w")
    ).distinct()
    hashed = tokens.select("doc_id", F.xxhash64("w").alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = hashed.groupBy("doc_id").agg(*votes)
    sig = F.lit(0)
    for i in range(bits):
        sig = sig + F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(0)
    return agg.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_near_pairs(
    signatures: DataFrame, max_hamming: int = 2, bits: int = 16, bands: int = 4
) -> DataFrame:
    """Candidate pairs share at least one of ``bands`` signature slices
    (pigeonhole: hamming ≤ bands-1 implies a shared slice when
    max_hamming < bands); verified by exact popcount Hamming distance."""
    width = bits // bands
    mask = (1 << width) - 1
    slices = None
    for b in range(bands):
        s = signatures.select(
            "doc_id",
            "simhash",
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(F.lit(mask))
            .alias("slice"),
        )
        slices = s if slices is None else slices.unionByName(s)
    a = slices.alias("a")
    b2 = slices.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_doc_id"),
            F.col("b.doc_id").alias("b_doc_id"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
