"""Similarity search over embedding columns (``array<float>``).

Two paths, same answer shape:

* **brute force** — broadcast the (small) query set, score every candidate
  with JVM-side ``zip_with``/``aggregate`` cosine, rank per query. Correct
  baseline; O(queries × corpus).
* **LSH-bucketed (random hyperplanes)** — project each vector onto k
  signed hyperplanes → k-bit signature; candidates share a signature band.
  Scales as O(corpus × bands) + per-bucket scoring; recall is tunable via
  (k, bands). The hyperplanes are generated from a seeded RNG on the
  driver, so the operator is deterministic.

An IVF variant would cluster first (KMeans) and probe nearest centroids;
the banded-LSH path covers the same scale goal without an ML-fit stage.
"""

from __future__ import annotations

import logging
import math
import random
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from near_event_streams_spark.functions.vector import cosine

log = logging.getLogger("nes.similarity")


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query (excluding self-matches).

    Ranking uses the 6dp-rounded cosine with the candidate id as tiebreak —
    fully deterministic across partitionings/engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "cand_id", "cos_sim")
    )


def cosine_near_pairs(
    corpus: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact; for bounded corpora /
    verification of the LSH path)."""
    a = corpus.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec")
    )
    b = corpus.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec")
    )
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_signatures(
    corpus: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane signature: bit j = sign(v · plane_j)."""
    planes = _hyperplanes(dim, n_planes, seed)
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        sig.alias("lsh_sig"),
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 16,
    band_size: int = 4,
    seed: int = 42,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 signature band with the
    query; exact cosine re-rank within candidates.

    At 100 TB the join is on (band, slice) — corpus-side fan-out is
    n_bands rows per vector, and only bucket-mates are scored.
    ``multiprobe`` additionally probes, on the QUERY side only, every
    band slice within that Hamming distance of the query's slice —
    recall rises steeply (P[band hit] goes from p^b to p^b + b·p^(b-1)(1-p)
    at distance 1) while the corpus-side layout and fan-out are untouched,
    which is the side that matters at scale.
    """
    if n_planes % band_size != 0:
        raise ValueError(
            f"n_planes={n_planes} not divisible by band_size="
            f"{band_size}: the {n_planes % band_size} leftover planes "
            "would be computed but never banded — the caller pays for "
            "projections that cannot affect recall (r13 review)"
        )
    if multiprobe > 2:
        raise ValueError(
            f"multiprobe={multiprobe}: probe masks are generated up to "
            "Hamming distance 2 only — a larger value would silently "
            "behave as 2 (r13 review)"
        )
    n_bands = n_planes // band_size
    mask = (1 << band_size) - 1

    def _xor_masks(max_dist: int) -> list[int]:
        out = [0]
        if max_dist >= 1:
            out += [1 << i for i in range(band_size)]
        if max_dist >= 2:
            out += [
                (1 << i) | (1 << j)
                for i in range(band_size)
                for j in range(i + 1, band_size)
            ]
        return out

    def banded(df: DataFrame, role: str, max_dist: int) -> DataFrame:
        sigs = lsh_signatures(df, dim, n_planes, seed, id_col, vec_col)
        probes = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("lsh_sig"), b * band_size)
                    .bitwiseAND(F.lit(mask))
                    .bitwiseXOR(F.lit(m))
                    .alias("slice"),
                )
                for b in range(n_bands)
                for m in _xor_masks(max_dist)
            ]
        )
        return sigs.select(
            F.col("vec_id").alias(f"{role}_id"),
            F.col("embedding").alias(f"{role}_vec"),
            F.explode(probes).alias("_p"),
        ).select(f"{role}_id", f"{role}_vec", "_p.band", "_p.slice")

    qb = banded(queries, "query", multiprobe)
    cb = banded(corpus, "cand", 0)
    cands = (
        qb.join(cb, ["band", "slice"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "query_vec", "cand_id", "cand_vec")
        .distinct()
    )
    scored = cands.select(
        "query_id",
        "cand_id",
        F.round(cosine(F.col("query_vec"), F.col("cand_vec")), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "cand_id", "cos_sim")
    )


def normalize_embeddings_arrow(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Unit-normalize embeddings via ``mapInArrow`` — zero-copy Arrow
    RecordBatches in and out, no pandas materialization (the lowest-
    overhead Python hook Spark has). Pre-normalizing the corpus turns
    every later cosine into a plain dot product: worth one narrow pass
    when the corpus is scored repeatedly (ANN indexing, near-dup sweeps).

    Emits ``(vec_id, unit, norm)``; zero vectors pass through unchanged
    with norm 0 rather than dividing by it.
    """
    import pyarrow as pa

    src = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
    )

    def batches(it):
        for batch in it:
            ids = batch.column("vec_id")
            vecs = batch.column("_v")
            flat = vecs.flatten().to_numpy(zero_copy_only=False)
            offsets = vecs.offsets.to_numpy(zero_copy_only=False)
            norms = np.array(
                [
                    float(np.sqrt((flat[s:e] ** 2).sum()))
                    for s, e in zip(offsets[:-1], offsets[1:])
                ]
            )
            units = [
                (flat[s:e] / n if n > 0 else flat[s:e]).astype("float64")
                for (s, e), n in zip(
                    zip(offsets[:-1], offsets[1:]), norms
                )
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(list(units), type=pa.list_(pa.float64())),
                    pa.array(norms, type=pa.float64()),
                ],
                names=["vec_id", "unit", "norm"],
            )

    return src.mapInArrow(
        batches, "vec_id long, unit array<double>, norm double"
    )


# ---------------------------------------------------------------------------
# IVF-Flat: KMeans coarse quantizer + nprobe centroid probing
# ---------------------------------------------------------------------------


def _sample_order(seed: int) -> list:
    """Total order for bounded deterministic training samples: a
    seeded value-hash of the id (uniform over the corpus, independent
    of file layout and insertion order), with the id itself breaking
    hash ties. Shared by the coarse-fit, PQ-residual, and OPQ samples
    so one seed draws one consistent sample."""
    return [F.xxhash64(F.col("vec_id"), F.lit(seed)), F.col("vec_id")]


def ivf_index(
    corpus: DataFrame,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_sample: int = 32768,
) -> tuple[DataFrame, list[list[float]]]:
    """Coarse-quantize the corpus: seeded k-means fit over a bounded
    sample → every vector tagged with its nearest-centroid ``cluster``
    id.

    The fit runs on a BOUNDED, DETERMINISTICALLY-ORDERED sample: the
    ``fit_sample`` rows ranked first by a seeded hash of their id
    (``xxhash64(vec_id, seed)`` — the FAISS coarse-training recipe: a
    few-tens-of-thousands sample saturates the centroids). Three
    properties, all load-bearing at scale: (a) BOUNDED — fitting the
    full corpus costs maxIter full passes, 10 reads of a 100 TB table
    for KB of centroids; (b) LAYOUT-INDEPENDENT — a partition-sampled
    init (what a distributed full-corpus fit does) inherits the
    source's FILE LAYOUT (two lakes with identical rows but different
    part-file names train different centroids, breaking reproducible
    index rebuilds — the crash-recovery e2e's probe-identity
    contract); a value-hash order depends only on row VALUES; (c)
    UNIFORM over the corpus — a ``vec_id``-prefix sample would anchor
    every rebuild to the OLDEST rows of an append-ordered corpus, so
    :func:`ivfpq_compact` retrains would be blind to drift in appended
    data once the corpus outgrows the sample (r13 review); a seeded
    hash ranks every row equally regardless of insertion order.

    Returns (assigned corpus, centroid list). Assignment is a
    broadcast map over the corpus; the centroid list is tiny
    (n_clusters × dim floats) and broadcasts to every probe.

    r17 (optimization): the fit runs as seeded Lloyd's on the DRIVER
    over the collected sample (one Arrow ``toPandas`` of ≤ fit_sample
    rows — the same bounded-driver-computation contract as
    :func:`_train_pq_codebooks`, which has always trained this way),
    replacing the MLlib ``KMeans.fit``: on a bounded sample the fit is
    an O(sample·k·dim) numpy loop, while the MLlib estimator spent
    ~15-20 distributed jobs (k-means|| init rounds + one job per Lloyd
    iteration + collects) to compute the same KB of centroids — pure
    scheduling overhead at any corpus scale, since the sample is fixed
    (guide §1.2: fix the algorithm's job shape first). Corpus
    assignment is one Arrow-batched GEMM pass (same kernel as
    :func:`_nearest_centroids`) instead of MLlib's per-row predictor
    UDF, and the VectorUDT conversion column disappears from the scan.
    Centroid VALUES differ from the MLlib fit (different init), so
    downstream recall/coverage gates were re-verified at sf0.001/0.01/
    0.1 (all thresholds hold; the gates are thresholds, not pins).
    """
    assigned, centroids, _ = _ivf_index_with_sample(
        corpus, n_clusters, seed, id_col, vec_col, fit_sample
    )
    return assigned, centroids


def _ivf_index_with_sample(
    corpus: DataFrame,
    n_clusters: int,
    seed: int,
    id_col: str,
    vec_col: str,
    fit_sample: int,
) -> tuple[DataFrame, list[list[float]], np.ndarray]:
    """:func:`ivf_index` body, also returning the collected coarse-fit
    sample matrix ``xs`` (``fit_sample`` rows in the seeded
    ``_sample_order``). :func:`ivfpq_index` / :func:`opq_index` slice
    their PQ-residual training sample from it on the driver instead of
    re-collecting a second ordered sample through a full corpus pass
    (r17, guide §1.2/§5: the old residual ``orderBy(...).limit(...)``
    re-evaluated the assignment UDF over EVERY corpus row and paid a
    second TakeOrdered job to fetch rows that are — by construction,
    same seed, same total order — a PREFIX of the sample already on the
    driver)."""
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    vecs = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
    )
    samp = (
        vecs.orderBy(*_sample_order(seed))
        .limit(fit_sample)
        .select("embedding")
        .toPandas()
    )
    xs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in samp["embedding"]]
    )
    cmat = _fit_kmeans_sample(xs, k=n_clusters, seed=seed)
    spark = SparkSession.getActiveSession()
    cnorms = (cmat**2).sum(axis=1)
    bc = spark.sparkContext.broadcast((cmat, cnorms))

    @pandas_udf("int")
    def nearest(vs: pd.Series) -> pd.Series:
        mat, norms = bc.value
        if len(vs) == 0:  # empty Arrow batch: np.stack([]) raises
            return pd.Series([], dtype="int32")
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        # squared L2 via the dot identity; ||x||^2 is argmin-constant.
        # np.argmin takes the FIRST minimum — the deterministic
        # duplicate-centroid tie rule every consumer (probe pruning,
        # persisted-index identity) relies on.
        d = norms[None, :] - 2.0 * (x @ mat.T)
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    assigned = vecs.select(
        "vec_id",
        "embedding",
        nearest(F.col("embedding")).alias("cluster"),
    )
    centroids = [list(map(float, c)) for c in cmat]
    return assigned, centroids, xs


def _fit_kmeans_sample(
    sample: np.ndarray, k: int, seed: int, n_iter: int = 10
) -> np.ndarray:
    """Seeded Lloyd's k-means over the bounded coarse-fit sample —
    driver numpy, shape (k, dim). Deterministic by the same recipe as
    :func:`_train_pq_codebooks`: seeded-random first center, farthest-
    point init for the rest, fixed iteration count, stable argmin ties;
    degenerate slots (fewer distinct points than k) are filled with the
    trained first center AFTER the loop, so a duplicate slot can never
    win an argmin against its live twin (lower index wins)."""
    n, dim = sample.shape
    rng = np.random.default_rng(seed)
    k_eff = min(k, len(np.unique(sample, axis=0)))
    cents = np.empty((k, dim), dtype=np.float64)
    cents[0] = sample[rng.integers(0, n)]
    d2 = ((sample - cents[0]) ** 2).sum(axis=1)
    for c in range(1, k_eff):
        cents[c] = sample[int(np.argmax(d2))]
        d2 = np.minimum(d2, ((sample - cents[c]) ** 2).sum(axis=1))
    sn = (sample**2).sum(axis=1)
    for _ in range(n_iter):
        live = cents[:k_eff]
        d = (
            sn[:, None]
            - 2.0 * (sample @ live.T)
            + (live**2).sum(axis=1)[None, :]
        )
        assign = np.argmin(d, axis=1)
        for c in range(k_eff):
            mask = assign == c
            if mask.any():
                cents[c] = sample[mask].mean(axis=0)
    cents[k_eff:] = cents[0]
    return cents


def _nearest_centroids(
    df: DataFrame, centroids: list[list[float]], nprobe: int, role: str
) -> DataFrame:
    """Tag each vector with its ``nprobe`` nearest centroid ids.

    The centroid matrix ships as a Spark broadcast VARIABLE consumed by an
    Arrow-batched pandas UDF — one copy per executor, zero bytes in the
    Catalyst plan. (The previous literal-array encoding re-analyzed
    O(n_clusters × dim) expression nodes per query, which stops working at
    the 4-65k centroids a 1B-vector index needs.) Assignment is one
    vectorized GEMM per Arrow batch; no shuffle, pure map.
    """
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    spark = SparkSession.getActiveSession()
    cmat = np.asarray(centroids, dtype=np.float64)
    cnorms = (cmat**2).sum(axis=1)
    bc = spark.sparkContext.broadcast((cmat, cnorms))

    @pandas_udf("array<int>")
    def probe_ids(vecs: pd.Series) -> pd.Series:
        mat, norms = bc.value
        if len(vecs) == 0:  # empty Arrow batch: np.stack([]) raises
            return pd.Series([], dtype="object")
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        # squared L2 via the dot-product identity; ||x||^2 is rank-constant
        d = norms[None, :] - 2.0 * (x @ mat.T)
        idx = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(idx.astype("int32")))

    return df.select(
        "*", F.explode(probe_ids(F.col(f"{role}_vec"))).alias("cluster")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF-Flat: corpus vectors live in their
    nearest-centroid bucket; each query probes its ``nprobe`` nearest
    centroids and scores only those buckets with exact cosine.

    Scale: the candidate join shuffles on ``cluster`` (bounded fan-out =
    corpus + queries×nprobe rows); scoring touches ~nprobe/n_clusters of
    the corpus per query instead of all of it. Recall tunes with nprobe
    (tests assert ≥0.6 recall@k vs brute force at nprobe=4/16).
    """
    assigned, centroids = ivf_index(
        corpus, n_clusters, seed, id_col, vec_col
    )
    cand = assigned.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cand_vec"),
        "cluster",
    )
    probes = _nearest_centroids(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("query_vec"),
        ),
        centroids,
        nprobe,
        "query",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        probes.join(cand, "cluster")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                cosine(F.col("query_vec"), F.col("cand_vec")), 6
            ).alias("cos_sim"),
        )
        .distinct()  # a candidate can appear via several probed clusters
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "cand_id", "cos_sim")
    )


def _train_pq_codebooks(
    sample: np.ndarray, m: int, ks: int, seed: int, n_iter: int = 12
) -> np.ndarray:
    """Lloyd's k-means per subspace over a residual sample → PQ
    codebooks, shape (m, ks, dsub). Pure numpy on the driver: PQ
    codebooks are trained on a FIXED-SIZE sample at any corpus scale
    (the FAISS recipe — a few thousand residuals saturate 256-entry
    codebooks), so this is a bounded O(sample) driver computation, not
    a collect-the-corpus anti-pattern. Deterministic: seeded greedy
    kmeans++-style init (farthest-point on the sample), stable argmin
    ties, fixed iteration count.

    r18 (optimization, guide §1.2 applied to the driver hot loop): the
    Lloyd step computes distances via the dot identity
    ``‖c‖² − 2·x@cᵀ`` (one GEMM; the row-constant ‖x‖² term cannot
    change an argmin and is dropped) instead of materializing the
    (n × ks × dsub) broadcast-subtraction tensor, and cluster means are
    one vectorized scatter-add + bincount instead of a ks-wide Python
    mask loop — measured 3.3 s → 0.25 s per ivfpq build at sf0.1 (the
    OPQ trainer calls this 5×). This is the SAME distance formulation
    the encode/assignment kernels already use (``_encode_pq``,
    ``_train_opq``'s recon step), so training and encoding now argmin
    the identical expression. Codebook VALUES can shift in the last
    float ulp vs the r17 form (different summation order); like the
    r17 MLlib→driver-Lloyd move, downstream recall/coverage gates are
    thresholds, not value pins — re-verified at sf0.001/0.01/0.1."""
    n, dim = sample.shape
    assert dim % m == 0, (dim, m)
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * dsub : (j + 1) * dsub]
        k_eff = min(ks, len(np.unique(x, axis=0)))
        # init: first center seeded-random, rest farthest-first
        cents = np.empty((ks, dsub))
        cents[0] = x[rng.integers(0, n)]
        d2 = ((x - cents[0]) ** 2).sum(axis=1)
        for c in range(1, k_eff):
            cents[c] = x[int(np.argmax(d2))]
            d2 = np.minimum(d2, ((x - cents[c]) ** 2).sum(axis=1))
        for _ in range(n_iter):
            live = cents[:k_eff]
            # ‖c‖² − 2·x@cᵀ: argmin-equivalent to the full squared L2
            # (np.argmin keeps the first minimum — stable ties)
            d = (live**2).sum(axis=1)[None, :] - 2.0 * (x @ live.T)
            assign = np.argmin(d, axis=1)
            counts = np.bincount(assign, minlength=k_eff)
            sums = np.zeros((k_eff, dsub), dtype=np.float64)
            np.add.at(sums, assign, x)
            nz = counts > 0
            cents[:k_eff][nz] = sums[nz] / counts[nz, None]
        # degenerate slots (duplicate-heavy sample → k_eff < ks) are
        # filled AFTER the Lloyd loop with the TRAINED first center, so
        # a padding slot encode's argmin happens to select decodes to a
        # live centroid, never a stale pre-training copy
        cents[k_eff:] = cents[0]
        books[j] = cents
    return books


def ivfpq_index(
    corpus: DataFrame,
    n_clusters: int = 16,
    m: int = 8,
    ks: int = 256,
    seed: int = 42,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]], np.ndarray]:
    """IVF-PQ index: coarse cluster id + product-quantized RESIDUAL
    codes (m bytes) + the true vector norm per corpus vector — the
    memory path for a 100 TB vector corpus, where IVF-Flat's full-width
    float32 scan is the binding constraint (a 64-dim float32 vector is
    256 B; its PQ row is m=8 code bytes + one norm — a ~16× candidate-
    scan byte reduction at this dim, larger at real 768-3072 dims).

    Layout: ``(vec_id, cluster, codes binary(m), vec_norm double)``.
    Codes quantize the residual ``x − C[cluster]`` (FAISS IVFPQ):
    subspace j's byte is the argmin codebook entry over that residual
    slice. Codebooks are trained once on a ≤``train_sample`` residual
    sample (bounded driver collect, seeded, deterministic) and shipped
    as a Spark broadcast; encoding is one Arrow-batched vectorized pass
    over the corpus — no shuffle beyond :func:`ivf_index`'s own
    assignment."""
    assert 2 <= ks <= 256, ks  # codes must fit one byte each
    assigned, centroids, coarse_xs = _ivf_index_with_sample(
        corpus, n_clusters, seed, id_col, vec_col, fit_sample=32768
    )
    cmat = np.asarray(centroids, dtype=np.float64)
    resid = _residual_sample(
        assigned, cmat, seed, train_sample, coarse_xs, coarse_budget=32768
    )
    books = _train_pq_codebooks(resid, m=m, ks=ks, seed=seed)
    enc = _encode_pq(assigned, cmat, books)
    return enc, centroids, books


def _residual_sample(
    assigned: DataFrame,
    cmat: np.ndarray,
    seed: int,
    train_sample: int,
    coarse_xs: np.ndarray | None = None,
    coarse_budget: int = 32768,
) -> np.ndarray:
    """Bounded, deterministic PQ-training residual sample: the top
    ``train_sample`` corpus rows in the seeded ``_sample_order``, minus
    their coarse centroid.

    r17 (optimization): when the coarse-fit sample ``coarse_xs`` is on
    hand and covers the requested rows (``train_sample`` ≤ its length,
    or the corpus is smaller than the coarse budget — the default
    4096 ≤ 32768 always qualifies), the residual sample is its PREFIX:
    both samples rank by the SAME seeded value-hash total order
    (``_sample_order(seed)``, ties broken by the unique ``vec_id``), so
    the top-``train_sample`` rows of ``assigned`` ARE the first
    ``train_sample`` rows already collected — and the cluster of each
    is recomputed on the driver with the exact argmin formulation the
    assignment UDF uses (same float64 ``norms − 2·x@C.T`` expression,
    same first-minimum tie rule), so the residuals are bit-identical to
    the old second ``orderBy().limit().toPandas()`` collection. That
    collection re-evaluated the assignment pandas UDF over EVERY corpus
    row plus a full TakeOrdered pass — one entire extra corpus scan per
    index build (guide §1.2/§4). A coarse sample SHORTER than its
    budget means the corpus itself is exhausted — the prefix slice then
    degenerates to "all rows", which is exactly what the distributed
    top-``train_sample`` would fetch. The distributed path remains for
    the (never-default) ``train_sample`` > coarse-budget case."""
    if coarse_xs is not None and (
        train_sample <= len(coarse_xs) or len(coarse_xs) < coarse_budget
    ):
        xs = coarse_xs[:train_sample]
        cnorms = (cmat**2).sum(axis=1)
        d = cnorms[None, :] - 2.0 * (xs @ cmat.T)
        clusters = np.argmin(d, axis=1)
        return xs - cmat[clusters]
    samp = (
        assigned.orderBy(*_sample_order(seed))
        .limit(train_sample)
        .select("embedding", "cluster")
        .toPandas()
    )
    xs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in samp["embedding"]]
    )
    return xs - cmat[samp["cluster"].to_numpy()]


def _encode_pq(
    assigned: DataFrame,
    cmat: np.ndarray,
    books: np.ndarray,
    rot: np.ndarray | None = None,
) -> DataFrame:
    """One Arrow-batched vectorized PQ-encode pass over an assigned
    frame ``(vec_id, embedding, cluster)`` with FIXED centroids and
    codebooks (broadcast once): residual → per-subspace argmin byte.
    Shared by :func:`ivfpq_index` (fresh build), :func:`ivfpq_encode`
    (append path — new vectors against an existing index's codebooks),
    and — with ``rot`` — their OPQ twins, whose residuals are rotated
    (``r @ R``) before quantization. Returns
    ``(vec_id, cluster, codes, vec_norm)``."""
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    spark = SparkSession.getActiveSession()
    m = int(books.shape[0])
    dsub = cmat.shape[1] // m
    bc = spark.sparkContext.broadcast((cmat, rot, books))

    @pandas_udf("struct<codes: binary, vec_norm: double>")
    def encode(vecs: pd.Series, clusters: pd.Series) -> pd.DataFrame:
        cents, rmat, cb = bc.value
        if len(vecs) == 0:  # empty Arrow batch: np.stack([]) raises
            return pd.DataFrame({"codes": [], "vec_norm": []})
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        r = x - cents[clusters.to_numpy()]
        if rmat is not None:
            r = r @ rmat
        codes = np.empty((len(x), m), dtype=np.uint8)
        for j in range(m):
            rj = r[:, j * dsub : (j + 1) * dsub]
            # ||r−c||² argmin via the dot identity; ||r||² is row-constant
            d = (cb[j] ** 2).sum(axis=1)[None, :] - 2.0 * (rj @ cb[j].T)
            codes[:, j] = np.argmin(d, axis=1)
        return pd.DataFrame(
            {
                "codes": [c.tobytes() for c in codes],
                "vec_norm": np.sqrt((x**2).sum(axis=1)),
            }
        )

    return assigned.select(
        "vec_id",
        "cluster",
        encode(F.col("embedding"), F.col("cluster")).alias("_e"),
    ).select("vec_id", "cluster", "_e.codes", "_e.vec_norm")


def ivfpq_encode(
    vectors: DataFrame,
    centroids: list[list[float]],
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode NEW vectors against an EXISTING index's coarse centroids
    and PQ codebooks — the incremental-ingest path: a production corpus
    appends millions of vectors a day without retraining (FAISS
    ``add``); centroids/codebooks only retrain on drift, as a deliberate
    rebuild. One broadcast-assign pass (nearest centroid) + the shared
    encode pass; no shuffle, no driver collect."""
    assigned = _nearest_centroids(
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            F.col(vec_col).alias("new_vec"),
        ),
        centroids,
        1,
        "new",
    ).select("vec_id", "embedding", "cluster")
    return _encode_pq(assigned, np.asarray(centroids, float), books)


def _append_codes(
    spark, path: str, enc_new: DataFrame, if_absent: bool
) -> None:
    """Shared append-write for :func:`ivfpq_append` / :func:`opq_append`:
    plain append-mode parquet into the per-cluster layout, or — with
    ``if_absent`` — the replay-idempotent variant that anti-joins the
    batch's ids against ONLY the cluster partitions it touches
    (partition pruning keeps the probe proportional to touched-cell
    size, not index size)."""
    if not if_absent:
        enc_new.write.mode("append").partitionBy("cluster").parquet(
            path + "/codes"
        )
        return
    # persist: the encode pass (Arrow pandas UDF) would otherwise run
    # twice — once for the touched-cell list, once for the write
    enc_new = enc_new.persist()
    try:
        touched = [
            int(r["cluster"])
            for r in enc_new.select("cluster").distinct().collect()
        ]
        existing = (
            spark.read.parquet(path + "/codes")
            .filter(F.col("cluster").isin(touched))
            .select("vec_id")
        )
        enc_new.join(existing, "vec_id", "left_anti").write.mode(
            "append"
        ).partitionBy("cluster").parquet(path + "/codes")
    finally:
        enc_new.unpersist()


# ---------------------------------------------------------------------------
# Index swap protocols: rename (HDFS/local) vs pointer (object stores)
# ---------------------------------------------------------------------------

#: pointer file name for ``swap_mode="pointer"`` layouts — lives directly
#: under the index root and holds the live version dir name (e.g. "v3")
_POINTER_FILE = "_CURRENT"
_VERSION_RE = re.compile(r"^v\d{1,10}$")


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path-class) for ``path`` via the session's Hadoop
    conf — the same FS the parquet writers target, so the swap
    protocols work wherever the data does."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _read_pointer(spark, path: str) -> str | None:
    """Raw ``_CURRENT`` content (stripped) or None when the file does
    not exist. TOLERANT of garbled content — callers decide whether
    garbage raises (:func:`resolve_index_base`) or falls through to
    version-dir resolution (:func:`ivfpq_recover`)."""
    fs, hp = _hadoop_fs(spark, path)
    p = hp(path.rstrip("/") + "/" + _POINTER_FILE)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        raw = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return raw.strip()


def _write_pointer(spark, path: str, version: str) -> None:
    """Flip the live-version pointer: ONE single-object create —
    atomic on S3-class stores (a PUT either lands whole or not at
    all), which is the entire point of the pointer protocol. On
    filesystems where create-overwrite is not atomic (local FS), a
    torn write is caught downstream: :func:`resolve_index_base`
    rejects non-``v<N>`` content and :func:`ivfpq_recover` resolves a
    garbled pointer from the version dirs themselves."""
    fs, hp = _hadoop_fs(spark, path)
    out = fs.create(hp(path.rstrip("/") + "/" + _POINTER_FILE), True)
    try:
        out.write(bytearray(version.encode("utf-8")))
    finally:
        out.close()


def resolve_index_base(spark, path: str) -> str:
    """The directory actually holding ``codes``/``meta`` for a
    persisted index at ``path``: ``path`` itself for a rename-mode
    layout (no ``_CURRENT``), ``<path>/<version>`` for a pointer-mode
    one. Every reader/appender resolves through this, so the two swap
    protocols share one probe/append/compact surface.

    Raises ``IOError`` on a garbled pointer instead of guessing — the
    same refuse-to-misread contract as the upsert store's ``_LATEST``
    (r13): run :func:`ivfpq_recover`, which repoints from the version
    dirs, rather than silently reading some other layout."""
    ptr = _read_pointer(spark, path)
    if ptr is None:
        return path.rstrip("/")
    if not _VERSION_RE.match(ptr):
        raise IOError(
            f"garbled index pointer at {path}/{_POINTER_FILE}: "
            f"{ptr[:64]!r} — run ivfpq_recover to repoint from the "
            "version directories"
        )
    return path.rstrip("/") + "/" + ptr


def _list_versions(spark, path: str) -> list[int]:
    """Sorted version numbers of ``v<N>`` subdirectories under a
    pointer-mode index root (empty when none / root missing)."""
    fs, hp = _hadoop_fs(spark, path)
    root = hp(path.rstrip("/"))
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and _VERSION_RE.match(name):
            out.append(int(name[1:]))
    return sorted(out)


def _meta_horizon(meta) -> int | None:
    """Persisted ``retain_versions`` horizon from a collected sidecar
    row — None on legacy (pre-r16) sidecars that never recorded one.
    Written by :func:`ivfpq_write` / every compact since r16 so that
    :func:`ivfpq_recover` and :func:`ivfpq_vacuum` can default to the
    horizon the maintenance jobs actually compact with, instead of a
    per-call knob every caller must repeat (r15 verdict #2 / advice:
    a recovery path that silently narrows a durability guarantee when
    an operator forgets a flag is the knob-drift class r13/r14 kept
    killing)."""
    if (
        "retain_versions" in meta.__fields__
        and meta["retain_versions"] is not None
    ):
        return int(meta["retain_versions"])
    return None


#: sentinel: the sidecar could not be read at all — distinct from a
#: READABLE legacy sidecar that simply carries no stamp. Callers must
#: not treat "can't read the horizon" as "horizon is 1" on any
#: destructive path: that would reclaim retained history under exactly
#: the transient-I/O conditions (S3 throttle, crash debris) where
#: retention matters most (r16 review).
_HORIZON_UNREADABLE = object()


def _sidecar_horizon(spark, base: str):
    """Persisted horizon read straight from one layout directory's
    sidecar: the stamped int, ``None`` for a readable legacy (pre-r16)
    sidecar with no stamp, or :data:`_HORIZON_UNREADABLE` when the
    sidecar cannot be read (missing, torn, transient I/O)."""
    try:
        rows = spark.read.parquet(base + "/meta").collect()
    except Exception:
        return _HORIZON_UNREADABLE
    if not rows:
        return _HORIZON_UNREADABLE
    return _meta_horizon(rows[0])


def _resolve_horizon(
    arg: int | None, persisted, op: str, path: str
) -> int:
    """Effective retention horizon for one maintenance call: an
    explicit ``arg`` wins — WARNING when it is narrower than the
    persisted horizon, because it is about to reclaim history the
    scheduled compacts deliberately kept — else the persisted value,
    else 1 (the pre-r16 default, so READABLE legacy layouts keep
    their old behavior until a write/compact stamps a horizon).

    ``persisted`` may be :data:`_HORIZON_UNREADABLE`; resolving that
    with ``arg=None`` to a DESTRUCTIVE horizon is the caller's bug —
    recover treats it as reclaim-nothing and vacuum refuses, so only
    an explicit arg (which wins without a warn — there is no known
    persisted value to compare against) reaches here with it."""
    if persisted is _HORIZON_UNREADABLE:
        persisted = None
    if arg is None:
        return persisted if persisted is not None else 1
    if persisted is not None and arg < persisted:
        log.warning(
            "%s(%s): explicit retain_versions=%d is NARROWER than the "
            "persisted horizon %d this index's maintenance jobs "
            "compact with — reclaiming retained history the compacts "
            "deliberately kept (stale readers inside the persisted "
            "grace window may lose files). Omit the argument to honor "
            "the persisted horizon.",
            op,
            path,
            arg,
            persisted,
        )
    return arg


def ivfpq_append(
    spark,
    path: str,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    if_absent: bool = False,
) -> None:
    """Append new vectors to a PERSISTED IVF-PQ index (see
    :func:`ivfpq_write`): reads the KB-sized sidecar, encodes the new
    vectors with the EXISTING centroids/codebooks, and appends their PQ
    rows into the hive-partitioned codes layout. Existing rows are
    never touched (append-mode parquet into per-cluster directories) —
    the index stays probe-consistent throughout.

    ``if_absent=True`` makes the append IDEMPOTENT: rows whose
    ``vec_id`` already exists in the target cells are dropped before
    the write, so a replayed streaming micro-batch (foreachBatch
    redelivery after a crash — the reference's restart semantics,
    ``configs.rs:101-127``) cannot double-insert candidates. Cost is
    one anti-join against ONLY the cluster partitions the new rows
    land in (hive partition pruning keeps it proportional to touched
    cells, not index size) — the same self-exclusion shape as the text
    ingest registry."""
    base = resolve_index_base(spark, path)
    _, centroids, books = ivfpq_read(spark, base, _resolved=True)
    enc_new = ivfpq_encode(vectors, centroids, books, id_col, vec_col)
    _append_codes(spark, base, enc_new, if_absent)


def ivfpq_compact(
    spark,
    path: str,
    corpus: DataFrame,
    min_appended_frac: float | None = None,
    n_clusters: int | None = None,
    m: int | None = None,
    ks: int | None = None,
    seed: int = 42,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rescale_cells: bool = False,
    opq: bool = False,
    drift_psi_threshold: float | None = None,
    retain_versions: int | None = None,
    _crash_before_swap: bool = False,
    _crash_between_renames: bool = False,
) -> dict:
    """Retrain-and-rewrite maintenance for a persisted IVF-PQ index
    that has absorbed appends (:func:`ivfpq_append` encodes new vectors
    against centroids trained BEFORE they existed — measured recall
    0.88-0.90 vs 0.94-1.0 fresh-build at r10's settings; the FAISS
    answer is a periodic re-train, and this is it).

    ``corpus`` is the raw vector source (the PQ rows are lossy — at
    production scale the full-width vectors live in the lake and the
    index is derived state, so compaction re-reads the source).
    Coarse centroids re-fit on a bounded seeded-HASH sample of the
    corpus (uniform over old and appended rows alike — a prefix
    sample would keep retraining on the oldest rows and stay blind to
    drift, r13 review); PQ codebooks retrain on the same
    bounded seeded ``train_sample`` residual sample as a fresh build;
    the per-cluster parquet layout is rewritten in place. ``m``/``ks``/
    ``n_clusters`` default to the EXISTING index's geometry (same byte
    budget), read from the KB-sized sidecar.

    ``rescale_cells=True`` lets the compact also TRACK CORPUS GROWTH:
    the cell count is re-derived as ``~√n`` of the RETRAIN CORPUS (the
    standard IVF sizing — cells ∝ √n balances per-cell scan length
    against probe fan-out) instead of inheriting the sidecar's frozen
    build-time geometry. An index built at 1M rows that absorbed
    appends to 100M keeps 1,000 cells forever without this — each
    probe then scans 100× longer cells than the fresh-build
    equivalent. A corpus under 2 rows skips the compact entirely
    (nothing to retrain from). Ignored when ``n_clusters`` is passed
    explicitly; PQ byte budget (m, ks) never changes here.

    When ``min_appended_frac`` is set, compaction is SKIPPED unless
    the appended fraction — (current codes rows − rows at last
    write/compact, recorded in the sidecar) / current — reaches it,
    so a scheduler can call this unconditionally after every ingest
    window and pay the rebuild only on real drift.
    ``drift_psi_threshold`` adds the OR-trigger the volume test can't
    express (see :func:`_compact_gate`): a compact also fires when the
    appended rows' coarse-cell occupancy PSI vs the at-write occupancy
    reaches the threshold, even below ``min_appended_frac``. Returns
    ``{"compacted": bool, "appended_frac": float|None, "n_rows": int,
    "n_clusters": int, "drift_psi": float|None,
    "retain_versions": int}`` (the EFFECTIVE horizon this call ran
    with, after persisted-value resolution).

    Swap protocol is AUTO-DETECTED from the layout: a rename-mode
    index (the :func:`ivfpq_write` default) rebuilds into a side dir
    and swaps via two directory renames — atomic on local FS/HDFS
    only; a pointer-mode index (``swap_mode="pointer"``) rebuilds into
    the NEXT versioned prefix ``<path>/v<N+1>`` and flips the
    single-object ``_CURRENT`` pointer — the object-store-safe
    protocol (S3A rename is a non-atomic client-side copy+delete; a
    single PUT is atomic). Both crash windows of both protocols are
    resolved mechanically by :func:`ivfpq_recover`.

    ``retain_versions`` is the STALE-READER grace window (r14 verdict
    #1): how many versions, counting the one this compact just made
    live, survive the post-flip cleanup. Since r16 the horizon is
    PERSISTED in the sidecar: the default ``None`` resolves to the
    value recorded at seed time / by the previous compact (legacy
    pre-r16 sidecars resolve to 1), the effective horizon is stamped
    into the retrained layout's sidecar, and an explicit argument
    narrower than the persisted one WARNS before it takes effect —
    one maintenance job with a forgotten flag can no longer silently
    reclaim grace history the others kept (r15 verdict #2).
    ``retain_versions=1`` deletes the superseded layout immediately —
    correct for a single-driver lifecycle, but a CONCURRENT
    long-running probe job that resolved the pointer before the flip
    then loses its files mid-scan, and object stores (where pointer
    mode is mandatory) are exactly where probe jobs run for hours.
    ``retain_versions=2`` keeps the
    just-superseded version for one compact cycle; the NEXT compact
    (or :func:`ivfpq_vacuum`, or :func:`ivfpq_recover` with the same
    horizon) reclaims it — the same retained-versions + vacuum shape
    as the upsert store (``streaming/upsert.vacuum``). Storage cost is
    ``retain_versions ×`` the codes layout. Only POINTER mode turns
    the retained version into true reader snapshot isolation (a
    pre-flip reader's resolved ``v<N>`` paths never mutate); rename
    mode's retained ``<path>.compact-old`` is a rollback copy, NOT
    reader isolation — the swap renames the directory out from under a
    mid-scan reader regardless (one more reason pointer mode is the
    shared-store deployment default). Rename mode has exactly one
    previous-version slot, so it supports horizons 1 (delete old
    immediately — the pre-r15 behavior) and 2 (keep old until the next
    compact's pre-clean); deeper horizons need the versioned pointer
    layout and raise here.
    """
    if retain_versions is not None and retain_versions < 1:
        raise ValueError(
            f"retain_versions must be >= 1, got {retain_versions}"
        )
    base = resolve_index_base(spark, path)
    pointer_mode = base != path.rstrip("/")
    if (
        retain_versions is not None
        and not pointer_mode
        and retain_versions > 2
    ):
        raise ValueError(
            f"retain_versions={retain_versions}: a rename-mode layout "
            "has exactly one previous-version slot "
            "(<path>.compact-old) — horizons deeper than 2 need the "
            "versioned swap_mode='pointer' layout"
        )
    gate = _compact_gate(
        spark, base, min_appended_frac, drift_psi_threshold
    )
    meta = gate["meta"]
    # the sidecar is already collected — resolving the persisted
    # horizon costs nothing here; a persisted rename-mode horizon can
    # never exceed 2 (ivfpq_write validates at stamp time)
    retain_versions = _resolve_horizon(
        retain_versions, _meta_horizon(meta), "ivfpq_compact", path
    )
    has_rot = "rot" in meta.__fields__ and meta["rot"] is not None
    if has_rot and not opq:
        raise ValueError(
            f"{path} holds an OPQ index (rotation in the sidecar); "
            "compact it with opq_compact — a plain-PQ retrain would "
            "silently drop the rotation and strand rotation-aware "
            "probes (r12 advisory)"
        )
    if opq and not has_rot:
        raise ValueError(
            f"{path} holds a plain IVF-PQ index (no rotation in the "
            "sidecar); compact it with ivfpq_compact — an OPQ retrain "
            "would silently CONVERT the index type, and every existing "
            "ivfpq_read/ivfpq_append consumer would start refusing it "
            "after the maintenance job (r13 review: the guard must cut "
            "both ways)"
        )
    if m is None:
        m = int(meta["m"])
    if ks is None:
        ks = int(meta["ks"])
    appended_frac = gate["appended_frac"]
    # scheduler skip FIRST: a skipped compact must cost only the
    # shared gate's sidecar read + partition-column codes aggregate —
    # deriving the rescale geometry below pays a full-lake
    # corpus.count() and would turn every checked-but-skipped ingest
    # window into a lake scan (r13 review)
    if not gate["due"]:
        return {
            "compacted": False,
            "appended_frac": appended_frac,
            "n_rows": gate["n_cur"],
            "n_clusters": len(meta["centroids"]),
            "drift_psi": gate["drift_psi"],
            "retain_versions": retain_versions,
        }
    if n_clusters is None:
        if rescale_cells:
            # ~sqrt(n) cells derived from the RETRAIN CORPUS — the
            # table the new geometry will actually hold — not from the
            # old index's codes count (r13 review: a drained index
            # compacted against a full lake, or a stale index against
            # a grown lake, would size cells from the wrong n). Floored
            # at the MLlib minimum of 2 and capped at the corpus row
            # count so KMeans never trains with more centers than
            # points (r12 advisory); a <2-row corpus has nothing to
            # retrain from, so the compact is SKIPPED outright.
            n_corpus = corpus.count()
            if n_corpus < 2:
                return {
                    "compacted": False,
                    "appended_frac": appended_frac,
                    "n_rows": gate["n_cur"],
                    "n_clusters": len(meta["centroids"]),
                    "drift_psi": gate["drift_psi"],
                    "retain_versions": retain_versions,
                }
            # √n, floored at MLlib's minimum of 2, capped by (a) the
            # corpus row count (KMeans must not want more centers than
            # points) and (b) a fixed ceiling well under ivf_index's
            # 32,768-row coarse-fit sample — past ~1B rows √n exceeds
            # the sample itself, and a k approaching the sample size
            # trains ~1 point per centroid (degenerate cells). 4,096
            # keeps ≥8 sample points per center; an index that big
            # should shard, not grow cells without bound (r13 review).
            n_clusters = max(
                2, min(int(round(n_corpus**0.5)), n_corpus, 4096)
            )
        else:
            n_clusters = len(meta["centroids"])
    rot = None
    if opq:
        enc, cents, rot, books = opq_index(
            corpus,
            n_clusters=n_clusters,
            m=m,
            ks=ks,
            seed=seed,
            train_sample=train_sample,
            id_col=id_col,
            vec_col=vec_col,
        )
    else:
        enc, cents, books = ivfpq_index(
            corpus,
            n_clusters=n_clusters,
            m=m,
            ks=ks,
            seed=seed,
            train_sample=train_sample,
            id_col=id_col,
            vec_col=vec_col,
        )
    fs, hpath = _hadoop_fs(spark, path)
    if pointer_mode:
        # Pointer protocol (object stores): build the full retrained
        # index into the NEXT versioned prefix, flip the single-object
        # `_CURRENT` pointer (atomic PUT on S3-class stores), then
        # delete every superseded version dir OUTSIDE the
        # `retain_versions` horizon (versions inside it survive as the
        # stale-reader grace window — see the docstring). A crash
        # before the flip leaves the live version authoritative and a
        # complete-but-unreferenced build beside it (discarded by
        # ivfpq_recover, with the `discarded_retrain` signal — work
        # lost, correctness not); a crash after the flip leaves only
        # stray old version dirs (reclaimed by ivfpq_recover to the
        # same horizon). At no point do probes see a partially-written
        # layout: readers resolve through the pointer, and the pointer
        # only ever names a COMPLETE build.
        ptr = _read_pointer(spark, path)
        new_n = int(ptr[1:]) + 1
        new_name = f"v{new_n}"
        new_base = path.rstrip("/") + "/" + new_name
        # _write_layout, not ivfpq_write: this is the INNER layout of a
        # pointer index (a version dir carries no _CURRENT of its own),
        # and the effective horizon — possibly > 2 — must be stamped
        # into its sidecar, which ivfpq_write's rename-mode seed
        # validation would refuse
        _write_layout(enc, cents, books, new_base, rot, retain_versions)
        if _crash_before_swap:
            # test seam: finished retrain, pointer NOT yet flipped —
            # the pointer twin of rename-mode's before-first-rename
            raise IOError(
                "injected crash before pointer flip (test seam)"
            )
        _write_pointer(spark, path, new_name)
        if _crash_between_renames:
            # test seam: pointer flipped, superseded version dir not
            # yet deleted — the stray-cleanup window
            raise IOError(
                "injected crash after pointer flip (test seam)"
            )
        # _list_versions-based cleanup, not a single delete of the
        # just-superseded dir: earlier compacts run with a deeper
        # horizon may have left several retained versions behind, and
        # THIS compact's horizon decides which of them are now
        # reclaimable
        for n in _list_versions(spark, path):
            if n <= new_n - retain_versions:
                fs.delete(hpath(path.rstrip("/") + f"/v{n}"), True)
        live_base = new_base
    else:
        # Rename protocol: build the full retrained index in a SIDE
        # directory, then swap it in with two filesystem renames
        # (Hadoop FileSystem API). The crash guarantee holds on
        # filesystems with ATOMIC directory rename — local FS and
        # HDFS; on object stores use `swap_mode="pointer"` at write
        # time instead (S3A rename is a non-atomic client-side
        # copy+delete). A crash before the first rename leaves the
        # live index untouched (the finished tmp build is discarded by
        # ivfpq_recover with the `discarded_retrain` signal); a crash
        # between the renames leaves the old index intact at
        # `<path>.compact-old` and the new one complete at
        # `<path>.compact-tmp` — both recovered mechanically by
        # :func:`ivfpq_recover`, which additionally validates that a
        # live layout is READABLE before it deletes tmp/old (defense
        # in depth against a partially-materialized live dir) — and at
        # no point can probes see NEW codes paired with an OLD sidecar
        # (the in-place overwrite's silent-wrong-distances failure
        # mode, r11 advisory).
        tmp = path.rstrip("/") + ".compact-tmp"
        old = path.rstrip("/") + ".compact-old"
        _write_layout(enc, cents, books, tmp, rot, retain_versions)
        if _crash_before_swap:
            # test seam: finished retrain at tmp, live untouched —
            # replayed schedulers re-fire the compact; the work is
            # lost, correctness is not (r13 verdict #5)
            raise IOError(
                "injected crash before first compact rename (test seam)"
            )
        fs.delete(hpath(old), True)
        if fs.exists(hpath(path)):
            if not fs.rename(hpath(path), hpath(old)):
                raise IOError(f"compact swap failed: {path} -> {old}")
        if _crash_between_renames:
            # fault-injection seam (tests only): die in the swap
            # window — live renamed away, the COMPLETE new build still
            # at tmp. The crash-recovery e2e uses this to prove
            # ivfpq_recover promotes the finished compact instead of
            # losing it.
            raise IOError(
                "injected crash between compact renames (test seam)"
            )
        if not fs.rename(hpath(tmp), hpath(path)):
            raise IOError(f"compact swap failed: {tmp} -> {path}")
        if retain_versions < 2:
            fs.delete(hpath(old), True)
        # retain_versions=2: `<path>.compact-old` survives as rename
        # mode's one-cycle stale-reader grace window (an EXPLICIT
        # contract since r15 — it used to exist only accidentally in
        # the crash path) and is reclaimed by the next compact's
        # pre-clean above, by an explicitly-narrower ivfpq_vacuum, or
        # by an explicitly-narrower ivfpq_recover (default-horizon
        # calls honor the persisted horizon since r16)
        live_base = path.rstrip("/")
    return {
        "compacted": True,
        "appended_frac": appended_frac,
        "n_rows": spark.read.parquet(live_base + "/codes").count(),
        "n_clusters": n_clusters,
        "drift_psi": gate["drift_psi"],
        "retain_versions": retain_versions,
    }


def _cell_occupancy_psi(meta, cur: dict[int, int]) -> float | None:
    """PSI of the APPENDED rows' coarse-cell occupancy against the
    at-write occupancy recorded in the sidecar (``cell_counts``,
    written by :func:`ivfpq_write` since r14) — computable from
    parquet footers alone (``cluster`` is a partition column; no
    vector reads). Laplace-smoothed ``(n+1)/(t+k)`` shares over the k
    cells, the repo's standard PSI recipe
    (``plans/curation.drift_psi_log``). Returns None when the sidecar
    predates ``cell_counts`` (drift unobservable — volume trigger
    still works) and 0.0 when nothing was appended."""
    if (
        "cell_counts" not in meta.__fields__
        or meta["cell_counts"] is None
    ):
        return None
    basis = [int(x) for x in meta["cell_counts"]]
    k = len(basis)
    if k == 0:
        return None
    appended = [max(cur.get(i, 0) - basis[i], 0) for i in range(k)]
    tot_a, tot_b = sum(appended), sum(basis)
    if tot_a == 0:
        return 0.0
    if tot_b == 0:
        return None
    psi = 0.0
    for a, b in zip(appended, basis):
        p = (a + 1.0) / (tot_a + k)
        q = (b + 1.0) / (tot_b + k)
        psi += (p - q) * math.log(p / q)
    return psi


def _compact_gate(
    spark,
    base: str,
    min_appended_frac: float | None,
    drift_psi_threshold: float | None = None,
) -> dict:
    """The ONE shared skip-gate behind :func:`compact_due` and
    :func:`ivfpq_compact` (r13 advisory: the two re-implemented the
    same test and could drift). Costs the KB sidecar read plus one
    partition-column-only codes aggregate — parquet footer row counts
    per cluster dir, no data columns, no corpus access. Returns
    ``{"due", "appended_frac", "n_cur", "meta", "drift_psi"}``.

    ``due`` is True when the appended fraction is unknown (no
    ``n_rows`` yardstick — conservative retrain), when NO trigger is
    armed at all (both thresholds None — the compact's
    fire-unconditionally ``None`` semantics), when the fraction
    reaches ``min_appended_frac``, OR (r14) when
    ``drift_psi_threshold`` is armed and the appended rows'
    cell-occupancy PSI reaches it. Each armed trigger fires
    independently, so a drift-only scheduler (volume threshold
    unset) is expressible. The drift OR-trigger exists because
    erosion is a DRIFT phenomenon, not a volume one (SCALE.md r13:
    iid appends at 50% volume hold recall flat 0.650→0.658; +2σ
    drift on 8/64 dims erodes 0.666→0.528) — a volume-only
    scheduler is blind to exactly the appends that hurt."""
    meta = spark.read.parquet(base + "/meta").collect()[0]
    out = {
        "meta": meta,
        "appended_frac": None,
        "n_cur": None,
        "drift_psi": None,
        "due": True,
    }
    n_base = (
        int(meta["n_rows"])
        if "n_rows" in meta.__fields__ and meta["n_rows"] is not None
        else None
    )
    if n_base is None:
        return out
    cur = {
        int(r["cluster"]): int(r["cnt"])
        for r in spark.read.parquet(base + "/codes")
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    n_cur = sum(cur.values())
    out["n_cur"] = n_cur
    if not n_cur:
        return out
    frac = (n_cur - n_base) / n_cur
    out["appended_frac"] = frac
    if min_appended_frac is None and drift_psi_threshold is None:
        out["due"] = True
        return out
    due = (
        min_appended_frac is not None and frac >= min_appended_frac
    )
    if drift_psi_threshold is not None:
        psi = _cell_occupancy_psi(meta, cur)
        out["drift_psi"] = psi
        if psi is None:
            # The armed drift trigger is UNOBSERVABLE on this index
            # (sidecar predates the r14 `cell_counts` baseline, or the
            # baseline is degenerate). Silence here is the
            # silently-inert-knob class r13 flagged on the sink's
            # compact knobs: a drift-ONLY scheduler would never fire
            # and the operator would discover the policy via an eroded
            # index (r14 advisory).
            if min_appended_frac is None:
                raise ValueError(
                    f"drift_psi_threshold={drift_psi_threshold} is the "
                    f"ONLY armed compact trigger for {base}, but the "
                    "index sidecar carries no usable cell_counts "
                    "baseline (written by ivfpq_write since r14) — "
                    "the scheduler would never fire. Rewrite/compact "
                    "the index once to stamp the baseline, or arm "
                    "min_appended_frac as the fallback trigger."
                )
            log.warning(
                "_compact_gate(%s): drift_psi_threshold=%s is armed "
                "but unobservable (sidecar has no usable cell_counts "
                "baseline) — only the volume trigger "
                "(min_appended_frac=%s) is live until a rewrite/"
                "compact stamps the baseline",
                base,
                drift_psi_threshold,
                min_appended_frac,
            )
        due = due or (psi is not None and psi >= drift_psi_threshold)
    out["due"] = due
    return out


def compact_due(
    spark,
    path: str,
    min_appended_frac: float | None,
    drift_psi_threshold: float | None = None,
) -> bool:
    """Cheap scheduler precheck for :func:`ivfpq_compact` /
    :func:`opq_compact` — :func:`_compact_gate` verbatim (one shared
    implementation, so the precheck and the compact's own skip test
    cannot drift, r13 advisory), costing only the sidecar read + a
    footer-level per-cell codes count — no corpus access. A streaming
    sink gates building the retrain corpus on this, because even
    constructing ``spark.read.parquet(lake_dir)`` pays partition
    discovery over every batch dir — O(lake dirs) per checked
    micro-batch for a check that usually says "not yet" (r13 review).
    ``drift_psi_threshold`` arms the r14 drift OR-trigger (see
    :func:`_compact_gate`)."""
    base = resolve_index_base(spark, path)
    return _compact_gate(
        spark, base, min_appended_frac, drift_psi_threshold
    )["due"]


def ivfpq_recover(
    spark, path: str, retain_versions: int | None = None
) -> str:
    """Crash recovery for :func:`ivfpq_compact`'s swap window, for BOTH
    swap protocols (auto-detected from the layout).

    ``retain_versions`` mirrors :func:`ivfpq_compact`'s stale-reader
    grace window. The default ``None`` reads the horizon PERSISTED in
    the sidecar (r16 — stamped by :func:`ivfpq_write` and every
    compact), so a no-argument recovery can never reclaim retained
    history the maintenance jobs deliberately kept; the r15 docstring
    had to WARN about exactly that footgun, which is the
    silently-inert-knob class this repo keeps killing. Legacy
    (pre-r16) sidecars without a stamp resolve to 1 — the old
    behavior — until a write/compact records one. An explicit argument
    overrides the persisted horizon, with a WARNING when it is
    narrower (it is about to reclaim protected history). The horizon
    never protects versions NEWER than the live pointer: those are
    unflipped retrains, not history, and are always discarded
    (``ok_discarded_retrain``). On a healthy layout with no history
    and no strays the horizon is never needed, so the fast path stays
    a handful of existence RPCs — no sidecar read.

    **Rename protocol.** The compact sequence is: build
    ``<path>.compact-tmp`` fully (codes, then sidecar) → rename live
    ``<path>`` to ``<path>.compact-old`` → rename tmp to ``<path>`` →
    delete old. States resolved:

    * live index present and readable — return ``"ok"`` (stray tmp/old
      deleted); when the deleted tmp was a COMPLETE build, return
      ``"ok_discarded_retrain"`` instead — a finished retrain died
      before its first rename and is being thrown away (the scheduler
      simply re-fires at the next due check: work lost, correctness
      not — r13 verdict #5 asked for the signal to be VISIBLE, not
      silent). Before DELETING strays the live layout is validated
      (sidecar collect + a footer-level codes read): on a filesystem
      whose rename is a non-atomic copy (S3A) a crash mid-rename can
      leave a PARTIAL live dir whose ``/meta`` exists — deleting
      tmp/old on that evidence alone would destroy the only complete
      copies (r12 advisory). An unreadable "live" falls through to the
      tmp/old resolution below. When no strays exist there is nothing
      destructive to do, so the meta-exists fast path answers without
      the validation read;
    * live missing/unreadable, tmp COMPLETE (its sidecar is written
      last, so a readable ``tmp/meta`` proves the whole build landed)
      — promote tmp to live, return ``"promoted_tmp"``;
    * live missing/unreadable, tmp absent/incomplete — restore the old
      index, return ``"restored_old"``.

    **Pointer protocol** (``swap_mode="pointer"`` layouts — a
    ``_CURRENT`` file and ``v<N>`` version dirs). The compact sequence
    is: build ``<path>/v<N+1>`` fully → flip ``_CURRENT`` (atomic
    single-object PUT) → delete ``v<N>``. States resolved:

    * pointer valid and its version readable — strays deleted, return
      ``"ok"``; a stray COMPLETE version NEWER than the pointer is a
      finished-but-unflipped retrain → ``"ok_discarded_retrain"``
      (same discard semantics as rename mode: the pointed-at live is
      authoritative — the stale build may predate appends);
    * pointer missing/garbled/pointing at an unreadable layout —
      repoint to the HIGHEST complete version dir, delete the rest,
      return ``"repointed"`` (the most recent complete state; a
      torn local-FS pointer write heals here);
    * no complete version — ``FileNotFoundError``.

    Raises ``FileNotFoundError`` when no state is recoverable. Call it
    before :func:`ivfpq_read` in any scheduler that may have died
    mid-compact; it is idempotent, and away from crash debris it costs
    a handful of existence RPCs and nothing else."""
    if retain_versions is not None and retain_versions < 1:
        raise ValueError(
            f"retain_versions must be >= 1, got {retain_versions}"
        )
    fs, hpath = _hadoop_fs(spark, path)
    root = path.rstrip("/")

    def layout_readable(base: str) -> bool:
        if not fs.exists(hpath(base + "/meta")):
            return False
        try:
            spark.read.parquet(base + "/meta").collect()
            # footer-level read of every codes file — catches a
            # partially-copied live dir; metadata-only, no row scan
            spark.read.parquet(base + "/codes").count()
            return True
        except Exception:
            return False

    versions = _list_versions(spark, root)
    ptr = _read_pointer(spark, root)
    if ptr is not None or versions:
        return _recover_pointer_layout(
            spark, fs, hpath, root, ptr, versions, layout_readable,
            retain_versions,
        )

    tmp = root + ".compact-tmp"
    old = root + ".compact-old"

    def tmp_complete() -> bool:
        return layout_readable(tmp)

    if fs.exists(hpath(root + "/meta")):
        old_exists = fs.exists(hpath(old))
        tmp_exists = fs.exists(hpath(tmp))
        if not tmp_exists and not old_exists:
            # healthy fast path: no strays and no grace slot — nothing
            # to decide, no sidecar read
            return "ok"

        _in_horizon_memo: list[bool] = []

        def _old_in_horizon() -> bool:
            # `.compact-old` within the horizon is retained history
            # (rename mode's one grace slot), not a stray: the default
            # None resolves the PERSISTED horizon from the live
            # sidecar (one KB read, memoized, taken only when old
            # exists — the no-slot loop above never pays it); an
            # UNREADABLE sidecar with no explicit horizon keeps the
            # slot (never guess a destructive horizon, r16 review); an
            # explicit narrower horizon reclaims, loudly.
            if _in_horizon_memo:
                return _in_horizon_memo[0]
            persisted = _sidecar_horizon(spark, root)
            if retain_versions is None and persisted is _HORIZON_UNREADABLE:
                log.warning(
                    "ivfpq_recover(%s): live sidecar unreadable — "
                    "cannot resolve the persisted retain_versions "
                    "horizon; keeping the .compact-old grace slot "
                    "(pass an explicit horizon to reclaim)",
                    root,
                )
                keep = True
            else:
                keep = (
                    _resolve_horizon(
                        retain_versions, persisted, "ivfpq_recover", path
                    )
                    >= 2
                )
            _in_horizon_memo.append(keep)
            return keep

        if not tmp_exists and _old_in_horizon():
            # grace-slot steady state: the retained copy stays and no
            # stray exists — nothing destructive, so skip the full
            # live-layout validation (per-batch sink path under a
            # horizon-2 rename setup would otherwise pay a codes
            # footer scan every batch just to conclude "nothing to
            # do", r16 review)
            return "ok"
        if layout_readable(root):
            reclaim_old = old_exists and not _old_in_horizon()
            discarded = tmp_exists and tmp_complete()
            fs.delete(hpath(tmp), True)
            if reclaim_old:
                fs.delete(hpath(old), True)
            if discarded:
                log.warning(
                    "ivfpq_recover(%s): discarding a COMPLETE retrain "
                    "stranded before its first rename — the compact "
                    "will re-fire at the next due check",
                    root,
                )
                return "ok_discarded_retrain"
            return "ok"
        # live has a sidecar but is not fully readable: crash debris —
        # fall through and resolve from tmp/old like a missing live
    if tmp_complete():
        fs.delete(hpath(root), True)
        if not fs.rename(hpath(tmp), hpath(root)):
            raise IOError(f"recover failed: {tmp} -> {root}")
        # the crash happened mid-swap, so `.compact-old` holds the
        # superseded version — within the horizon it stays as the
        # grace copy, exactly as if the compact had finished. The
        # promoted layout's sidecar carries the crashed compact's OWN
        # effective horizon, so the default-None recover finishes the
        # swap with exactly the cleanup that compact would have done
        # (tmp_complete() just proved the sidecar readable, so the
        # unreadable sentinel is a narrow race — resolved by KEEPING
        # the grace copy, never by guessing a destructive horizon).
        promoted = _sidecar_horizon(spark, root)
        if retain_versions is None and promoted is _HORIZON_UNREADABLE:
            reclaim = False
        else:
            reclaim = (
                _resolve_horizon(
                    retain_versions, promoted, "ivfpq_recover", path
                )
                < 2
            )
        if reclaim:
            fs.delete(hpath(old), True)
        return "promoted_tmp"
    if fs.exists(hpath(old + "/meta")):
        fs.delete(hpath(root), True)
        fs.delete(hpath(tmp), True)
        if not fs.rename(hpath(old), hpath(root)):
            raise IOError(f"recover failed: {old} -> {root}")
        return "restored_old"
    raise FileNotFoundError(
        f"no recoverable IVF-PQ index state at {root} "
        "(no live, complete-tmp, or old layout)"
    )


def _recover_pointer_layout(
    spark, fs, hpath, root, ptr, versions, layout_readable,
    retain_versions,
) -> str:
    """Pointer-protocol half of :func:`ivfpq_recover` (see its
    docstring for the state walk). ``retain_versions`` spares
    superseded versions INSIDE the grace horizon from stray cleanup;
    versions newer than the live pointer are unflipped retrains and
    are never history, so the horizon does not apply to them. With the
    default ``None`` the horizon is resolved from the live version's
    PERSISTED stamp — read only when older versions actually exist, so
    the healthy no-history recover call stays at existence-RPC cost
    (the per-batch sink path; under a grace window one retained
    version is always present and the resolution costs one KB sidecar
    read per batch, the same read the sink's append already pays)."""
    live_n = (
        int(ptr[1:]) if ptr is not None and _VERSION_RE.match(ptr) else None
    )
    if live_n is not None and live_n in versions:
        live_base = f"{root}/v{live_n}"
        newer = [n for n in versions if n > live_n]
        older = [n for n in versions if n < live_n]
        if not newer and not older:
            return "ok"  # nothing destructive to validate for
        if older:
            persisted = _sidecar_horizon(spark, live_base)
            if retain_versions is None and persisted is _HORIZON_UNREADABLE:
                # can't read the stamp and no explicit horizon: reclaim
                # NOTHING rather than guess — treating "unreadable" as
                # "legacy, horizon 1" would delete retained grace
                # history under exactly the transient-I/O / crash
                # conditions retention exists for (r16 review; the
                # unreadable live will usually fail layout_readable
                # below and resolve via repoint anyway)
                log.warning(
                    "ivfpq_recover(%s): live sidecar unreadable — "
                    "cannot resolve the persisted retain_versions "
                    "horizon; leaving all %d retained version(s) in "
                    "place (pass an explicit horizon to reclaim)",
                    root,
                    len(older),
                )
                horizon = live_n + 1  # nothing is ever <= live - this
            else:
                horizon = _resolve_horizon(
                    retain_versions, persisted, "ivfpq_recover", root
                )
        else:
            horizon = retain_versions or 1
        reclaimable = [n for n in older if n <= live_n - horizon]
        if not newer and not reclaimable:
            return "ok"
        if layout_readable(live_base):
            discarded = False
            for n in newer:
                sb = f"{root}/v{n}"
                if layout_readable(sb):
                    discarded = True
                    log.warning(
                        "ivfpq_recover(%s): discarding COMPLETE "
                        "unflipped retrain v%d — the compact will "
                        "re-fire at the next due check",
                        root,
                        n,
                    )
                fs.delete(hpath(sb), True)
            for n in reclaimable:
                fs.delete(hpath(f"{root}/v{n}"), True)
            return "ok_discarded_retrain" if discarded else "ok"
        # pointed-at version has a sidecar but is unreadable: fall
        # through to highest-complete resolution
    complete = [n for n in sorted(versions, reverse=True)
                if layout_readable(f"{root}/v{n}")]
    if not complete:
        raise FileNotFoundError(
            f"no recoverable IVF-PQ index state at {root} "
            "(pointer missing/garbled and no complete version dir)"
        )
    keep = complete[0]
    # the repoint path is already reading sidecars (layout validation),
    # so the default-None horizon resolves from the repointed live's
    # OWN stamp — the horizon its maintenance jobs ran with. keep was
    # just validated readable, so the unreadable sentinel is a narrow
    # race here; it still resolves to reclaim-nothing-below-keep, never
    # to a guessed destructive horizon.
    persisted_keep = _sidecar_horizon(spark, f"{root}/v{keep}")
    if retain_versions is None and persisted_keep is _HORIZON_UNREADABLE:
        horizon = keep + 1
    else:
        horizon = _resolve_horizon(
            retain_versions, persisted_keep, "ivfpq_recover", root
        )
    _write_pointer(spark, root, f"v{keep}")
    for n in versions:
        if n == keep:
            continue
        # retained history: COMPLETE versions inside the horizon below
        # the repointed live survive; incomplete dirs are crash debris
        # at any age (nothing can ever read them)
        if n < keep and n > keep - horizon and n in complete:
            continue
        fs.delete(hpath(f"{root}/v{n}"), True)
    return "repointed"


def ivfpq_vacuum(
    spark, path: str, retain_versions: int | None = None
) -> int:
    """Reclaim superseded index versions OUTSIDE the grace horizon —
    the explicit storage-cost lever for :func:`ivfpq_compact`'s
    ``retain_versions`` window (the ANN twin of the upsert store's
    ``streaming/upsert.vacuum``). Returns the number of version
    layouts deleted.

    The default ``None`` vacuums to the horizon PERSISTED in the live
    sidecar (r16 — stamped at seed/compact; legacy pre-r16 sidecars
    resolve to 1), so an out-of-band vacuum run with defaults can no
    longer silently reclaim grace history the scheduled compacts
    deliberately kept (the r15-advice footgun). An explicit argument
    overrides, WARNING when narrower than the persisted horizon; with
    the default, an UNREADABLE live sidecar on a path that contains
    index state raises ``IOError`` (run :func:`ivfpq_recover` first)
    instead of guessing a horizon and deleting history under crash
    debris — while a NEVER-SEEDED path (no pointer, versions, grace
    slot, or layout dirs) returns 0: a scheduled vacuum cron pointed
    at a not-yet-seeded index has nothing to reclaim and must not die
    (r16 advice).

    * Pointer layout: deletes every ``v<N>`` with
      ``N <= live - horizon`` (horizon 1 keeps only the live
      version). Versions NEWER than the live pointer are never
      touched — one may be a concurrent compact's in-flight build;
      unflipped-retrain debris is :func:`ivfpq_recover`'s job, which
      validates completeness before acting.
    * Rename layout: horizon 1 deletes the one grace slot
      ``<path>.compact-old``; deeper horizons have nothing to reclaim.
      ``<path>.compact-tmp`` is never touched for the same in-flight
      reason.

    Raises ``IOError`` on a garbled pointer (run :func:`ivfpq_recover`
    first) rather than guessing which versions are live."""
    if retain_versions is not None and retain_versions < 1:
        raise ValueError(
            f"retain_versions must be >= 1, got {retain_versions}"
        )
    fs, hpath = _hadoop_fs(spark, path)
    root = path.rstrip("/")
    ptr = _read_pointer(spark, root)
    live_base = root
    if ptr is not None and not _VERSION_RE.match(ptr):
        raise IOError(
            f"garbled index pointer at {root}/{_POINTER_FILE}: "
            f"{ptr[:64]!r} — run ivfpq_recover before vacuuming"
        )
    if ptr is not None:
        live_base = f"{root}/{ptr}"
    # one KB sidecar read per vacuum: resolves the persisted horizon
    # for the default AND powers the narrower-than-persisted warning
    # for explicit calls. Vacuum is a scheduled maintenance op, not a
    # per-batch hot path, so the read is cheap relative to its job.
    # _sidecar_horizon distinguishes "legacy sidecar" (readable, no
    # stamp -> pre-r16 default 1) from "unreadable live layout"
    # (default-run refuses: vacuuming under crash debris with a
    # guessed horizon could delete the only complete copies' history).
    persisted = _sidecar_horizon(spark, live_base)
    if retain_versions is None and persisted is _HORIZON_UNREADABLE:
        # Never-seeded path (or plain-rename root with no index yet):
        # a scheduled default vacuum pointed at an index that does not
        # exist has nothing to reclaim and must return 0, not die —
        # the remediation in the error below (ivfpq_recover) would
        # itself raise FileNotFoundError on an empty path (r16
        # advice). The IOError is reserved for paths that DO contain
        # index state (a pointer, version dirs, grace slot, or layout
        # subdirs) whose live sidecar is unreadable: crash debris,
        # where guessing a horizon could delete the only complete
        # copies' history.
        has_state = (
            ptr is not None
            or bool(_list_versions(spark, root))
            or fs.exists(hpath(root + ".compact-old"))
            or fs.exists(hpath(f"{live_base}/meta"))
            or fs.exists(hpath(f"{live_base}/codes"))
        )
        if not has_state:
            return 0
        raise IOError(
            f"cannot resolve the persisted retain_versions horizon "
            f"at {live_base} (live sidecar missing or unreadable) — "
            "run ivfpq_recover first, or pass an explicit "
            "retain_versions"
        )
    horizon = _resolve_horizon(
        retain_versions, persisted, "ivfpq_vacuum", path
    )
    if ptr is not None:
        live_n = int(ptr[1:])
        removed = 0
        for n in _list_versions(spark, root):
            if n <= live_n - horizon:
                fs.delete(hpath(f"{root}/v{n}"), True)
                removed += 1
        return removed
    old = root + ".compact-old"
    if horizon < 2 and fs.exists(hpath(old)):
        fs.delete(hpath(old), True)
        return 1
    return 0


def ivfpq_write(
    enc: DataFrame,
    centroids: list[list[float]],
    books: np.ndarray,
    path: str,
    rot: np.ndarray | None = None,
    swap_mode: str = "rename",
    retain_versions: int | None = None,
) -> None:
    """Persist an IVF-PQ index built by :func:`ivfpq_index` — at
    production scale the index is built ONCE and probed for months, so
    rebuild-per-query (what :func:`ivfpq_topk` does when handed a raw
    corpus) must not be the only path.

    Layout — everything goes through Spark writers, so the same code
    targets HDFS/S3 on a cluster:

    * ``<path>/codes`` — the PQ rows, hive-partitioned **by coarse
      cluster**: a probe touching ``nprobe`` of ``n_clusters`` cells
      reads only those directories (partition pruning — the on-disk
      twin of IVF's candidate pruning).
    * ``<path>/meta`` — one-row parquet sidecar with the coarse
      centroids, the PQ codebooks (KBs — ``n_clusters·dim`` +
      ``m·ks·dsub`` doubles — independent of corpus size), the codes
      row count at write time (``n_rows`` — parquet-footer count of
      the just-written layout, the yardstick :func:`ivfpq_compact`
      uses to measure the appended fraction), and the per-cell
      occupancy at write time (``cell_counts`` — the baseline the r14
      drift trigger compares appended-row routing against; same
      footer scan that produces ``n_rows``), and the persisted
      retention horizon (``retain_versions``, r16 — see below). When
      ``rot`` is given
      (the OPQ path, :func:`opq_write`), the dim×dim rotation rides
      along as one extra sidecar column.

    ``swap_mode`` picks the maintenance-swap protocol this index will
    use for its whole life (auto-detected by everything downstream):

    * ``"rename"`` (default) — codes/meta live directly at ``path``;
      :func:`ivfpq_compact` swaps retrains in with two directory
      renames. Correct on atomic-rename filesystems (local, HDFS).
    * ``"pointer"`` — codes/meta live in a versioned prefix
      ``<path>/v<N>`` named by the single-object ``_CURRENT`` pointer
      file; compacts build ``v<N+1>`` and flip the pointer (one
      atomic PUT). The object-store deployment default: S3A
      directory "rename" is a non-atomic client-side copy+delete, so
      the rename protocol's crash guarantee does not hold there
      (SCALE.md r13; built r14 per the verdict).

    ``retain_versions`` seeds the PERSISTED retention horizon (r16):
    the sidecar records it, and every downstream maintenance call —
    :func:`ivfpq_compact`, :func:`ivfpq_recover`, :func:`ivfpq_vacuum`
    and the streaming ingest sink — defaults to the persisted value,
    so one job passing a different flag can no longer silently reclaim
    history another kept. Default ``None`` resolves to **2 in pointer
    mode** (one compact cycle of stale-reader grace — pointer mode
    exists for shared object stores, exactly where long probe jobs
    hold pre-flip paths; storage cost is one codes copy, ~0.02% of the
    indexed lake per SCALE.md r15) and **1 in rename mode** (the
    retained ``.compact-old`` is a rollback copy, not reader
    isolation, so delete-immediately stays the single-driver default).
    """
    if swap_mode not in ("rename", "pointer"):
        raise ValueError(
            f"ivfpq_write: swap_mode={swap_mode!r} (want 'rename' or "
            "'pointer')"
        )
    if retain_versions is None:
        retain_versions = 2 if swap_mode == "pointer" else 1
    if retain_versions < 1:
        raise ValueError(
            f"retain_versions must be >= 1, got {retain_versions}"
        )
    if swap_mode == "rename" and retain_versions > 2:
        raise ValueError(
            f"retain_versions={retain_versions}: a rename-mode layout "
            "has exactly one previous-version slot "
            "(<path>.compact-old) — horizons deeper than 2 need the "
            "versioned swap_mode='pointer' layout"
        )
    spark = enc.sparkSession
    # Refuse PROTOCOL MIXING at one path: a rename write under a live
    # pointer layout lands codes/meta at the root where every reader's
    # pointer resolution will never look (silently invisible data);
    # a pointer write over a rename layout leaves the old root
    # codes/meta as permanent shadow debris. Pick one protocol per
    # index for its whole life.
    fs, hp = _hadoop_fs(spark, path)
    if swap_mode == "rename" and _read_pointer(spark, path) is not None:
        raise ValueError(
            f"{path} is a pointer-mode index (_CURRENT present); "
            "write it with swap_mode='pointer' — a rename-mode write "
            "here would be invisible behind the pointer"
        )
    if swap_mode == "pointer" and fs.exists(
        hp(path.rstrip("/") + "/meta")
    ):
        raise ValueError(
            f"{path} is a rename-mode index (root codes/meta "
            "present); write it with swap_mode='rename' or use a "
            "fresh path — mixing protocols strands the root layout "
            "as shadow debris"
        )
    if swap_mode == "pointer":
        # next version = current+1 when overwriting a live pointer
        # layout, v0 on a fresh path. The post-flip sweep honors the
        # SAME horizon this write stamps into the new sidecar (r16
        # review: it used to delete every superseded dir immediately,
        # so a default re-seed — stamping horizon 2 — yanked files
        # from a pre-flip reader on exactly the shared stores the
        # stamp promises to protect; scheduled ivfpq_compact retrains
        # remain the first-choice reader-safe path). Versions NEWER
        # than the new seed are never history (stale in-flight builds
        # of an index being replaced) and are always deleted.
        ptr = _read_pointer(spark, path)
        cur = (
            int(ptr[1:])
            if ptr is not None and _VERSION_RE.match(ptr)
            else None
        )
        new_n = cur + 1 if cur is not None else 0
        new_name = f"v{new_n}"
        _write_layout(
            enc, centroids, books, path.rstrip("/") + "/" + new_name,
            rot, retain_versions,
        )
        _write_pointer(spark, path, new_name)
        fs, hp = _hadoop_fs(spark, path)
        for n in _list_versions(spark, path):
            if n > new_n or n <= new_n - retain_versions:
                fs.delete(hp(path.rstrip("/") + f"/v{n}"), True)
        return
    _write_layout(enc, centroids, books, path, rot, retain_versions)


def _write_layout(
    enc: DataFrame,
    centroids: list[list[float]],
    books: np.ndarray,
    path: str,
    rot: np.ndarray | None,
    retain_versions: int,
) -> None:
    """Write one codes+meta layout directly at ``path`` (the shared
    body of both swap modes — pointer mode points ``path`` inside a
    version dir)."""
    m = int(books.shape[0])
    spark = enc.sparkSession
    # Pin STATIC overwrite for the codes rewrite: under a session-level
    # 'dynamic' partitionOverwriteMode only the clusters PRESENT in
    # `enc` would be replaced, so cluster directories absent from a
    # retrained layout would survive with codes encoded against OLD
    # codebooks under the NEW sidecar — silently wrong search results
    # (r11 advisory).
    from near_event_streams_spark.session import partition_overwrite_mode

    with partition_overwrite_mode(spark, "static"):
        enc.write.mode("overwrite").partitionBy("cluster").parquet(
            path + "/codes"
        )
    # one partition-column-only aggregate yields BOTH the n_rows
    # yardstick and the per-cell occupancy baseline (footer counts per
    # cluster dir — no data columns)
    per_cell = {
        int(r["cluster"]): int(r["cnt"])
        for r in spark.read.parquet(path + "/codes")
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    n_rows = sum(per_cell.values())
    cell_counts = [per_cell.get(i, 0) for i in range(len(centroids))]
    row = (
        m,
        int(books.shape[1]),
        [[float(x) for x in c] for c in centroids],
        [
            [[float(x) for x in cent] for cent in book]
            for book in books
        ],
        n_rows,
        cell_counts,
        int(retain_versions),
    )
    schema = (
        "m int, ks int, centroids array<array<double>>, "
        "books array<array<array<double>>>, n_rows bigint, "
        "cell_counts array<bigint>, retain_versions int"
    )
    if rot is not None:
        row = row + ([[float(x) for x in r] for r in np.asarray(rot)],)
        schema += ", rot array<array<double>>"
    spark.createDataFrame([row], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path + "/meta")


def _load_layout(spark, base: str):
    """(codes frame, sidecar row) of one RESOLVED layout directory —
    the shared body of :func:`ivfpq_read` and :func:`opq_read`, so the
    OPQ reader costs exactly one sidecar collect (it used to read the
    meta parquet twice: once inside ivfpq_read and once for the
    rotation — a second footer GET per probe on S3-class stores)."""
    enc = spark.read.parquet(base + "/codes").select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        "codes",
        "vec_norm",
    )
    meta = spark.read.parquet(base + "/meta").collect()[0]
    return enc, meta


def ivfpq_read(
    spark, path: str, _allow_rot: bool = False, _resolved: bool = False
) -> tuple[DataFrame, list[list[float]], np.ndarray]:
    """Load a persisted IVF-PQ index (see :func:`ivfpq_write`) into the
    ``(enc, centroids, books)`` triple :func:`ivfpq_topk` accepts via
    ``index=``. The codes frame stays lazy (and hive-partitioned by
    cluster, so probes prune cells at the scan); only the KB-sized
    sidecar row is collected.

    Raises ``ValueError`` when pointed at an OPQ layout (the sidecar
    carries a rotation): the codes quantize ROTATED residuals, so
    plain-PQ probes would score them without the rotation and
    :func:`ivfpq_append` would encode UNROTATED residuals against
    rotated-residual codebooks — both silently wrong (the mirror of
    :func:`opq_read`'s refusal of a rotation-less layout, r12
    advisory). ``_allow_rot`` is the internal escape hatch
    :func:`opq_read` uses after taking ownership of the rotation.

    Pointer-mode layouts (``swap_mode="pointer"``) resolve through the
    ``_CURRENT`` file transparently — callers never see version
    dirs. ``_resolved=True`` (internal) skips that resolution when the
    caller already holds the resolved base — append/compact resolve
    once up front, and re-resolving costs a ``_CURRENT`` existence
    check that is a real GET per call on S3-class stores (r14
    advisory)."""
    if not _resolved:
        path = resolve_index_base(spark, path)
    else:
        path = path.rstrip("/")
    enc, meta = _load_layout(spark, path)
    if (
        not _allow_rot
        and "rot" in meta.__fields__
        and meta["rot"] is not None
    ):
        raise ValueError(
            f"{path} holds an OPQ index (rotation in the sidecar); "
            "read it with opq_read / maintain it with opq_append and "
            "opq_compact — plain IVF-PQ math on rotated-residual codes "
            "returns wrong distances"
        )
    books = np.asarray(meta["books"], dtype=np.float64)
    return enc, meta["centroids"], books


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    m: int = 8,
    ks: int = 256,
    nprobe: int = 4,
    refine: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[DataFrame, list[list[float]], np.ndarray] | None = None,
) -> DataFrame:
    """Approximate top-k via IVF-PQ with exact refinement: queries probe
    their ``nprobe`` nearest coarse centroids; candidate scoring reads
    ONLY the PQ rows (cluster id, m code bytes, stored norm — never the
    full vectors), reconstructing the asymmetric inner product
    ``⟨q, C[cluster]⟩ + Σ_j ⟨q_j, cb_j[code_j]⟩`` in one vectorized
    Arrow pass; each query's top ``refine·k`` approximate candidates
    are then re-scored EXACTLY (full-vector fetch by id — a k-bounded
    semi-join, not a scan) so emitted cosines are exact and
    approximation affects recall only, never the reported values.

    Scale: the wide float vectors are touched only at (a) index build
    and (b) the refine fetch of refine·k·|queries| rows; the per-query
    candidate scan is m+8 bytes/vector. Same output shape as
    :func:`ivf_topk`: ``(query_id, rank, cand_id, cos_sim)``.

    ``index``: a prebuilt ``(enc, centroids, books)`` triple — from
    :func:`ivfpq_index` or :func:`ivfpq_read` — that makes this call
    probe-only (the production shape: build once, probe for months).
    When None, the index is built from ``corpus`` per call; ``corpus``
    is still required either way for the exact refine fetch."""
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    if index is not None:
        enc, centroids, books = index
        # accept list-typed codebooks (sidecar values round-tripped
        # through JSON) — the same normalization opq_topk applies
        books = np.asarray(books, dtype=np.float64)
        m = int(books.shape[0])  # codes width is the index's, not the arg
    else:
        enc, centroids, books = ivfpq_index(
            corpus, n_clusters, m, ks, seed, id_col=id_col, vec_col=vec_col
        )
    spark = SparkSession.getActiveSession()
    cmat = np.asarray(centroids, dtype=np.float64)
    bc = spark.sparkContext.broadcast((cmat, books))
    dsub = cmat.shape[1] // m

    probes = _nearest_centroids(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("query_vec"),
        ),
        centroids,
        nprobe,
        "query",
    )

    @pandas_udf("double")
    def adc_score(
        qvecs: pd.Series,
        clusters: pd.Series,
        codes: pd.Series,
        norms: pd.Series,
    ) -> pd.Series:
        cents, cb = bc.value
        if len(qvecs) == 0:  # empty Arrow batch: np.stack([]) raises
            return pd.Series([], dtype="float64")
        q = np.stack([np.asarray(v, dtype=np.float64) for v in qvecs])
        c = np.frombuffer(
            b"".join(codes.tolist()), dtype=np.uint8
        ).reshape(len(q), -1)
        ip = np.einsum("ij,ij->i", q, cents[clusters.to_numpy()])
        for j in range(c.shape[1]):
            qj = q[:, j * dsub : (j + 1) * dsub]
            ip += np.einsum("ij,ij->i", qj, cb[j][c[:, j]])
        qn = np.sqrt((q**2).sum(axis=1))
        den = qn * norms.to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(den > 0, ip / den, 0.0)
        return pd.Series(out)

    w_approx = Window.partitionBy("query_id").orderBy(
        F.desc("approx_sim"), F.asc("cand_id")
    )
    shortlist = (
        probes.join(
            enc.select(
                F.col("vec_id").alias("cand_id"),
                "cluster",
                "codes",
                "vec_norm",
            ),
            "cluster",
        )
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "query_vec",
            "cand_id",
            adc_score(
                F.col("query_vec"),
                F.col("cluster"),
                F.col("codes"),
                F.col("vec_norm"),
            ).alias("approx_sim"),
        )
        # a candidate reached via several probed clusters scores
        # identically (same cluster id in its PQ row) — keep one
        .dropDuplicates(["query_id", "cand_id"])
        .withColumn("_rk", F.row_number().over(w_approx))
        .filter(F.col("_rk") <= refine * k)
        .select("query_id", "query_vec", "cand_id")
    )
    full = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        shortlist.join(full, "cand_id")
        .select(
            "query_id",
            "cand_id",
            F.round(
                cosine(F.col("query_vec"), F.col("cand_vec")), 6
            ).alias("cos_sim"),
        )
        # a refine source holding the same vec_id twice (a lake keeps
        # cross-batch redeliveries in separate batch_id partitions)
        # would otherwise emit that candidate at two ranks and evict a
        # real neighbor; dedup POST-join — shortlist-sized, not a
        # shuffle of the wide corpus (r13 review)
        .dropDuplicates(["query_id", "cand_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "cand_id", "cos_sim")
    )


def _train_opq(
    resid: np.ndarray, m: int, ks: int, seed: int, n_rounds: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """OPQ-NP (Ge et al., CVPR 2013 — the non-parametric alternation):
    learn an orthogonal rotation ``R`` so the rotated residuals
    quantize better under the SAME byte budget, by alternating (a) PQ
    codebook training on ``resid @ R`` with (b) the orthogonal
    Procrustes update ``R = U·Vᵀ`` from ``svd(residᵀ · recon)``. Pure
    numpy on the bounded driver sample (same contract as
    :func:`_train_pq_codebooks`: fixed-size input at any corpus scale,
    seeded, fixed iteration counts — deterministic). Returns
    ``(R, books)`` with ``R`` dim×dim orthogonal."""
    n, dim = resid.shape
    R = np.eye(dim)
    dsub = dim // m
    for _ in range(n_rounds):
        xr = resid @ R
        books = _train_pq_codebooks(xr, m=m, ks=ks, seed=seed, n_iter=6)
        recon = np.empty_like(xr)
        for j in range(m):
            xj = xr[:, j * dsub : (j + 1) * dsub]
            d = (books[j] ** 2).sum(axis=1)[None, :] - 2.0 * (
                xj @ books[j].T
            )
            recon[:, j * dsub : (j + 1) * dsub] = books[j][
                np.argmin(d, axis=1)
            ]
        u, _, vt = np.linalg.svd(resid.T @ recon)
        R = u @ vt
    books = _train_pq_codebooks(
        resid @ R, m=m, ks=ks, seed=seed, n_iter=12
    )
    return R, books


def opq_index(
    corpus: DataFrame,
    n_clusters: int = 16,
    m: int = 8,
    ks: int = 256,
    seed: int = 42,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]], np.ndarray, np.ndarray]:
    """IVF-OPQ index: :func:`ivfpq_index` with a learned orthogonal
    rotation applied to residuals before product quantization — the
    classic recall lift at an IDENTICAL byte budget (still m code bytes
    + one norm per vector), because rotating decorrelates the subspaces
    PQ quantizes independently. Same bounded-driver-training /
    broadcast / Arrow-encode shape; the only extra broadcast payload is
    the dim×dim rotation. Returns ``(enc, centroids, R, books)``."""
    assert 2 <= ks <= 256, ks
    assigned, centroids, coarse_xs = _ivf_index_with_sample(
        corpus, n_clusters, seed, id_col, vec_col, fit_sample=32768
    )
    cmat = np.asarray(centroids, dtype=np.float64)
    # r17: residual sample sliced from the coarse-fit sample (same
    # seeded total order) — see _residual_sample for the equivalence
    # argument and the corpus pass this saves
    resid = _residual_sample(
        assigned, cmat, seed, train_sample, coarse_xs, coarse_budget=32768
    )
    rot, books = _train_opq(resid, m=m, ks=ks, seed=seed)
    enc = _encode_pq(assigned, cmat, books, rot)
    return enc, centroids, rot, books


def opq_encode(
    vectors: DataFrame,
    centroids: list[list[float]],
    rot: np.ndarray,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """OPQ twin of :func:`ivfpq_encode` — encode NEW vectors against an
    EXISTING OPQ index's centroids, rotation and codebooks (the
    incremental-ingest path; no retrain). One broadcast-assign pass +
    the shared rotated-residual encode pass."""
    assigned = _nearest_centroids(
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            F.col(vec_col).alias("new_vec"),
        ),
        centroids,
        1,
        "new",
    ).select("vec_id", "embedding", "cluster")
    return _encode_pq(
        assigned, np.asarray(centroids, float), books, np.asarray(rot)
    )


def opq_write(
    enc: DataFrame,
    centroids: list[list[float]],
    rot: np.ndarray,
    books: np.ndarray,
    path: str,
    swap_mode: str = "rename",
    retain_versions: int | None = None,
) -> None:
    """Persist an OPQ index built by :func:`opq_index` — the same
    cluster-partitioned codes layout and KB-sized sidecar as
    :func:`ivfpq_write` (including ``swap_mode`` and the persisted
    ``retain_versions`` horizon), with the dim×dim rotation carried as
    one extra sidecar column (``rot``); probes read back through
    :func:`opq_read` and hand the 4-tuple to ``opq_topk(index=...)``."""
    ivfpq_write(
        enc, centroids, books, path, rot=rot, swap_mode=swap_mode,
        retain_versions=retain_versions,
    )


def opq_read(
    spark, path: str, _resolved: bool = False
) -> tuple[DataFrame, list[list[float]], np.ndarray, np.ndarray]:
    """Load a persisted OPQ index (see :func:`opq_write`) into the
    ``(enc, centroids, rot, books)`` 4-tuple ``opq_topk`` accepts via
    ``index=``. Raises ``ValueError`` when pointed at a plain IVF-PQ
    layout (no rotation in the sidecar) — probing PQ codes with OPQ
    math would silently return wrong distances. ``_resolved`` as in
    :func:`ivfpq_read`; one pointer resolution and ONE sidecar collect
    total (r14 advisory: this used to resolve twice and read the meta
    parquet twice per call)."""
    if not _resolved:
        path = resolve_index_base(spark, path)
    else:
        path = path.rstrip("/")
    enc, meta = _load_layout(spark, path)
    if "rot" not in meta.__fields__ or meta["rot"] is None:
        raise ValueError(
            f"{path} holds a plain IVF-PQ index (no rotation sidecar); "
            "read it with ivfpq_read"
        )
    books = np.asarray(meta["books"], dtype=np.float64)
    rot = np.asarray(meta["rot"], dtype=np.float64)
    return enc, meta["centroids"], rot, books


def opq_append(
    spark,
    path: str,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    if_absent: bool = False,
) -> None:
    """Append new vectors to a PERSISTED OPQ index — the OPQ twin of
    :func:`ivfpq_append`: sidecar read, rotated-residual encode with
    the EXISTING geometry, append-mode parquet into the per-cluster
    layout; existing rows never touched. ``if_absent=True`` is the
    same replay-idempotent anti-join (pruned to touched cells)."""
    base = resolve_index_base(spark, path)
    _, centroids, rot, books = opq_read(spark, base, _resolved=True)
    enc_new = opq_encode(vectors, centroids, rot, books, id_col, vec_col)
    _append_codes(spark, base, enc_new, if_absent)


def opq_compact(
    spark,
    path: str,
    corpus: DataFrame,
    min_appended_frac: float | None = None,
    n_clusters: int | None = None,
    m: int | None = None,
    ks: int | None = None,
    seed: int = 42,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rescale_cells: bool = False,
    drift_psi_threshold: float | None = None,
    retain_versions: int | None = None,
    _crash_before_swap: bool = False,
    _crash_between_renames: bool = False,
) -> dict:
    """OPQ twin of :func:`ivfpq_compact`: retrain (centroids, rotation
    AND codebooks) over the full corpus, rebuild aside, swap in with
    the same protocol the layout was written under — rename or
    pointer, auto-detected (recoverable via :func:`ivfpq_recover` —
    the layouts are identical apart from the sidecar's rotation
    column). Same ``min_appended_frac`` / ``drift_psi_threshold``
    scheduling, ``rescale_cells`` geometry tracking, and
    ``retain_versions`` stale-reader grace window."""
    return ivfpq_compact(
        spark,
        path,
        corpus,
        min_appended_frac=min_appended_frac,
        n_clusters=n_clusters,
        m=m,
        ks=ks,
        seed=seed,
        train_sample=train_sample,
        id_col=id_col,
        vec_col=vec_col,
        rescale_cells=rescale_cells,
        opq=True,
        drift_psi_threshold=drift_psi_threshold,
        retain_versions=retain_versions,
        _crash_before_swap=_crash_before_swap,
        _crash_between_renames=_crash_between_renames,
    )


def opq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    m: int = 8,
    ks: int = 256,
    nprobe: int = 4,
    refine: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[DataFrame, list[list[float]], np.ndarray, np.ndarray]
    | None = None,
) -> DataFrame:
    """:func:`ivfpq_topk` with the OPQ rotation: candidates are scored
    asymmetrically against ROTATED-residual codebooks — since the
    decoded residual is ``r̂ @ Rᵀ``, the query-side fix is one rotate
    per query (``q @ R``) before the subspace dot products; the
    candidate scan still reads m+8 bytes per vector and the refine
    stage still re-scores the shortlist exactly, so approximation
    affects recall only. Same output shape: ``(query_id, rank,
    cand_id, cos_sim)``. ``index=`` accepts a persisted index's
    ``(enc, centroids, rot, books)`` 4-tuple (:func:`opq_read`) and
    skips the per-call build — the same amortization contract as
    ``ivfpq_topk(index=...)``."""
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    if index is not None:
        enc, centroids, rot, books = index
        books = np.asarray(books, dtype=np.float64)
        rot = np.asarray(rot, dtype=np.float64)
        m = int(books.shape[0])  # geometry comes from the index
    else:
        enc, centroids, rot, books = opq_index(
            corpus, n_clusters, m, ks, seed,
            id_col=id_col, vec_col=vec_col,
        )
    spark = SparkSession.getActiveSession()
    cmat = np.asarray(centroids, dtype=np.float64)
    bc = spark.sparkContext.broadcast((cmat, rot, books))
    dsub = cmat.shape[1] // m

    probes = _nearest_centroids(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("query_vec"),
        ),
        centroids,
        nprobe,
        "query",
    )

    @pandas_udf("double")
    def adc_score(
        qvecs: pd.Series,
        clusters: pd.Series,
        codes: pd.Series,
        norms: pd.Series,
    ) -> pd.Series:
        cents, rmat, cb = bc.value
        if len(qvecs) == 0:
            return pd.Series([], dtype="float64")
        q = np.stack([np.asarray(v, dtype=np.float64) for v in qvecs])
        c = np.frombuffer(
            b"".join(codes.tolist()), dtype=np.uint8
        ).reshape(len(q), -1)
        ip = np.einsum("ij,ij->i", q, cents[clusters.to_numpy()])
        qr = q @ rmat  # ⟨q, r̂@Rᵀ⟩ = ⟨q@R, r̂⟩
        for j in range(c.shape[1]):
            qj = qr[:, j * dsub : (j + 1) * dsub]
            ip += np.einsum("ij,ij->i", qj, cb[j][c[:, j]])
        qn = np.sqrt((q**2).sum(axis=1))
        den = qn * norms.to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(den > 0, ip / den, 0.0)
        return pd.Series(out)

    w_approx = Window.partitionBy("query_id").orderBy(
        F.desc("approx_sim"), F.asc("cand_id")
    )
    shortlist = (
        probes.join(
            enc.select(
                F.col("vec_id").alias("cand_id"),
                "cluster",
                "codes",
                "vec_norm",
            ),
            "cluster",
        )
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "query_vec",
            "cand_id",
            adc_score(
                F.col("query_vec"),
                F.col("cluster"),
                F.col("codes"),
                F.col("vec_norm"),
            ).alias("approx_sim"),
        )
        .dropDuplicates(["query_id", "cand_id"])
        .withColumn("_rk", F.row_number().over(w_approx))
        .filter(F.col("_rk") <= refine * k)
        .select("query_id", "query_vec", "cand_id")
    )
    full = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        shortlist.join(full, "cand_id")
        .select(
            "query_id",
            "cand_id",
            F.round(
                cosine(F.col("query_vec"), F.col("cand_vec")), 6
            ).alias("cos_sim"),
        )
        # same post-join dedup as ivfpq_topk: a duplicate vec_id in
        # the refine source must not occupy two ranks (r13 review)
        .dropDuplicates(["query_id", "cand_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "cand_id", "cos_sim")
    )


def knn_label_agreement(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    neighbors: DataFrame | None = None,
) -> DataFrame:
    """Leave-one-out kNN label agreement — the mislabeled-sample signal
    a labeled-embedding curation pipeline runs (cleanlab-style label
    auditing): each vector's own label vs the majority label of its k
    nearest neighbors (self excluded). Disagreement rows are the
    relabel/review candidates.

    ``neighbors`` is the pluggable candidate generator: any frame with
    ``(query_id, cand_id, cos_sim)`` — :func:`ivf_topk`'s shape — and
    THIS is the 100 TB path (cluster-pruned candidates, never an
    all-pairs GEMM over the corpus). When None, falls back to exact
    :func:`brute_force_topk` — quadratic, the correct baseline at test
    scale only. Majority is fully deterministic: most votes, ties to
    the smallest label. Returns
    ``(vec_id, label, knn_label, n_votes, label_consistent)``.
    """
    nb = (
        neighbors
        if neighbors is not None
        else brute_force_topk(corpus, corpus, k, id_col, vec_col)
    )
    cand_labels = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(label_col).alias("cand_label")
    )
    votes = (
        nb.join(cand_labels, "cand_id")
        .groupBy("query_id", "cand_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("cand_label")
    )
    top = (
        votes.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "query_id",
            F.col("cand_label").alias("knn_label"),
            "n_votes",
        )
    )
    own = corpus.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("label")
    )
    return own.join(top, "query_id").select(
        F.col("query_id").alias(id_col),
        "label",
        "knn_label",
        "n_votes",
        (F.col("label") == F.col("knn_label")).alias("label_consistent"),
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.35,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", arXiv:2303.09540): cluster the embeddings with the
    IVF KMeans coarse quantizer, then compute EXACT pairwise cosine only
    WITHIN each cluster. Returns ``(a_id, b_id, cluster, cos_sim)`` for
    within-cluster pairs at or above ``threshold``.

    Scale: the all-pairs comparison that is quadratic in the corpus
    becomes quadratic per cluster — the SemDeDup design point. The
    cluster self-join is key-equi on ``cluster`` (shuffle-partitioned,
    AQE-splittable when one cluster runs hot); at larger corpora raise
    ``n_clusters`` so the per-cluster pair count stays bounded. Found
    pairs are a SUBSET of the exact global pair set by construction
    (cosine is exact; only cross-cluster pairs can be missed).
    """
    assigned, _ = ivf_index(corpus, n_clusters, seed, id_col, vec_col)
    a = assigned.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_vec"),
        "cluster",
    )
    b = assigned.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_vec"),
        "cluster",
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            "cluster",
            F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup_keep(
    corpus: DataFrame,
    threshold: float = 0.35,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector SemDeDup decision: a vector is DROPPED when a
    smaller-id vector in its cluster sits at or above the cosine
    threshold (deterministic min-id representative, same winner rule as
    the text dedup family). Returns the kept rows of ``corpus``."""
    pairs = semantic_dedup_pairs(
        corpus, threshold, n_clusters, seed, id_col, vec_col
    )
    dropped = pairs.select(F.col("b_id").alias(id_col)).distinct()
    return corpus.join(dropped, id_col, "left_anti")


def quantize_int8_recon(
    emb: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Int8 scalar quantization of an embedding column with
    reconstruction audit — the 4× storage/bandwidth reduction step for a
    100 TB embedding store (serve quantized, rescore exact on the
    shortlist).

    Per-dimension min/max over the corpus define an affine code:
    ``q = floor((v-mn)/(mx-mn)*255 + 0.5) - 128`` (int8), decoded as
    ``mn + (q+128)*(mx-mn)/255``. Per vector the operator emits the
    code's quality: cosine(original, reconstruction) and the max
    absolute per-dim error, both computed as SEQUENTIAL folds so a
    cross-engine oracle replays them bit-for-bit.

    Plan shape at 100 TB: the per-dim stats are ONE scalar aggregate
    (2·dim columns in a single row — no explode, no shuffle on a dim
    key), broadcast back; encode/decode/audit are a narrow map of array
    expressions inside codegen. Nothing scales with corpus size but the
    scan.
    """
    v = F.col(vec_col)
    # stats arrays are double so every engine runs the affine code in
    # float64 (float32 minus float32 stays float32 in Spark but not in
    # every SQL engine — pin the width instead of trusting promotion)
    stats = emb.agg(
        F.array(
            *[
                F.min(F.element_at(v, i + 1)).cast("double")
                for i in range(dim)
            ]
        ).alias("mins"),
        F.array(
            *[
                F.max(F.element_at(v, i + 1)).cast("double")
                for i in range(dim)
            ]
        ).alias("maxs"),
    )
    idx = F.sequence(F.lit(1), F.lit(dim))

    # A dimension that is constant across the corpus has zero span; the
    # unguarded ratio is 0/0 (NULL in Spark, NaN/Inf in IEEE engines).
    # Pin the ratio to 0 so the code round-trips mn exactly on both
    # engines (decode multiplies by the zero span, no guard needed).
    def _ratio(i):
        span = F.element_at("maxs", i) - F.element_at("mins", i)
        return F.when(
            span > 0,
            (F.element_at(v, i).cast("double") - F.element_at("mins", i))
            / span,
        ).otherwise(F.lit(0.0))

    enc = F.transform(
        idx,
        lambda i: F.floor(_ratio(i) * 255.0 + 0.5).cast("int") - 128,
    )
    coded = emb.crossJoin(F.broadcast(stats)).withColumn("q", enc)
    rec = F.transform(
        idx,
        lambda i: F.element_at("mins", i)
        + (F.element_at("q", i) + 128).cast("double")
        * (F.element_at("maxs", i) - F.element_at("mins", i))
        / 255.0,
    )
    coded = coded.withColumn("recon", rec)

    def fold_sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    dot = fold_sum(
        F.zip_with(v, F.col("recon"), lambda a, b: a.cast("double") * b)
    )
    n_orig = F.sqrt(
        fold_sum(
            F.transform(v, lambda a: a.cast("double") * a.cast("double"))
        )
    )
    n_rec = F.sqrt(
        fold_sum(F.transform("recon", lambda a: a * a))
    )
    max_err = F.array_max(
        F.zip_with(
            v, F.col("recon"), lambda a, b: F.abs(a.cast("double") - b)
        )
    )
    return coded.select(
        F.col(id_col).alias("vec_id"),
        F.concat_ws(
            ",", F.transform(F.slice("q", 1, 8), lambda x: x.cast("string"))
        ).alias("q_head"),
        F.round(dot / (n_orig * n_rec), 6).alias("recon_cosine"),
        F.round(max_err, 6).alias("max_abs_err"),
    )


def group_centroid_similarity(
    df: DataFrame,
    group_col: str = "source",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Pairwise cosine between per-group embedding CENTROIDS — the
    domain-similarity map data-mixing work consumes (which sources are
    near-duplicates of each other in embedding space, which are the
    diversity outliers).

    Scale shape: the corpus collapses to |groups| centroid rows in ONE
    aggregate (2·dim decimal sums per group — no dim-key explode
    shuffle; the per-element round→decimal makes the sums order- and
    engine-exact, divided as doubles); the pairwise stage is a
    broadcast self-join over the bounded group count with sequential
    cosine folds an oracle replays bit-for-bit. Nothing downstream of
    the first aggregate ever touches corpus rows.
    """
    v = F.col(vec_col)
    means = df.groupBy(group_col).agg(
        *[
            (
                F.sum(
                    F.round(
                        F.element_at(v, i + 1).cast("double"), 12
                    ).cast("decimal(26,12)")
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias(f"m{i}")
            for i in range(dim)
        ]
    )
    cent = means.select(
        F.col(group_col),
        F.array(*[F.col(f"m{i}") for i in range(dim)]).alias("c"),
    )
    a = cent.select(
        F.col(group_col).alias("a_source"), F.col("c").alias("ca")
    )
    b = cent.select(
        F.col(group_col).alias("b_source"), F.col("c").alias("cb")
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(
        F.col("a_source") < F.col("b_source")
    )

    def fold_sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    dot = fold_sum(
        F.zip_with("ca", "cb", lambda x, y: x * y)
    )
    na = F.sqrt(fold_sum(F.transform("ca", lambda x: x * x)))
    nb = F.sqrt(fold_sum(F.transform("cb", lambda x: x * x)))
    return pairs.select(
        "a_source",
        "b_source",
        F.round(dot / (na * nb), 6).alias("centroid_cosine"),
    ).orderBy("a_source", "b_source")


def kmeans_lloyd_fixedpoint(
    embs: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    offset_units: int = 1_000_000,
) -> DataFrame:
    """Lloyd's k-means in FIXED-POINT integer arithmetic — the
    iterative-clustering family (with PageRank and the BPE trainer)
    done so every superstep is bit-for-bit replayable by the DuckDB
    oracle: components quantize to non-negative integer units
    (``floor(x * scale) + offset_units``), squared-L2 distances are
    exact bigint folds in index order, centroid updates are exact
    integer means — no float-summation order to disagree about.

    Deterministic by construction: init = the ``k`` smallest ids'
    vectors; assignment ties break on the lower cluster id (the fold
    visits candidates in ascending cluster order and replaces only on
    strictly-smaller distance); a cluster that loses all members drops
    out (documented, mirrored by the oracle's group-by). Returns the
    final assignment ``(vec_id, cluster, dist_units)``.

    Scale shape (the 100 TB path): assignment is a ZERO-SHUFFLE narrow
    map — the k centroids embed as a plan-literal array of structs
    (bounded: k·dim bigints, the same bounded-literal transport as the
    Bloom bitmap and the BPE best-pair) and the argmin is one
    whole-stage-codegen fold over that array per row; no corpus-wide
    window, no per-candidate explode. The only shuffle per superstep is
    the centroid update: one (cluster, pos) aggregate — k·dim grouping
    keys, map-side partials — whose k·dim result rows come back to the
    driver as the next round's literals (bounded collect, same contract
    as the BPE trainer's best-pair row). The quantized input is
    persisted once; the handle is caller-owned (clearCache).

    Overflow headroom: |units| <= 2·scale ⇒ dist <= dim·(2·scale)² ≈
    2.6e14 per 64-dim row — 4 orders under bigint.
    """
    if iters < 1:
        raise ValueError(
            f"iters={iters}: at least one Lloyd superstep is required "
            "(the assignment frame is produced inside the loop — the "
            "same guard power_iteration_pc1 applies, r13 review)"
        )
    u = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
            "long"
        )
        + F.lit(offset_units),
    )
    v = embs.select(F.col(id_col).alias("vec_id"), u.alias("u")).persist()
    # Oracle parity (truncating div == floor div) and bigint overflow
    # headroom both rest on quantized units being NON-NEGATIVE, i.e.
    # every component >= -offset_units/scale. Fail loudly instead of
    # silently diverging from the DuckDB oracle on an out-of-range
    # corpus (one cheap scan of the already-persisted frame).
    min_unit = v.select(
        F.min(F.array_min("u")).alias("mn")
    ).first()["mn"]
    if min_unit is not None and min_unit < 0:
        raise ValueError(
            f"kmeans_lloyd_fixedpoint: component below "
            f"-offset_units/scale = {-offset_units / scale}: quantized "
            f"unit {min_unit} < 0 — raise offset_units to cover the "
            f"corpus min"
        )
    first = v.orderBy("vec_id").limit(k).collect()
    centroids: list[tuple[int, list[int]]] = [
        (c, list(row["u"])) for c, row in enumerate(first)
    ]

    def best_of(cents: list[tuple[int, list[int]]]):
        # ONE SQL-text expression, not k*dim F.lit() calls: each lit is
        # a py4j roundtrip (~3 ms), so 8x64 of them per superstep cost
        # seconds of DRIVER time while the job itself takes 0.1 s —
        # the same literal-transport lesson as bloom_probe, solved the
        # parser way because a 512-child CreateArray is cheap to
        # analyze at single reference count
        cands = F.expr(
            "array("
            + ",".join(
                f"struct({c} as cluster, array("
                + ",".join(f"{int(x)}L" for x in cu)
                + ") as cu)"
                for c, cu in cents
            )
            + ")"
        )
        dist_to = lambda cand: F.aggregate(  # noqa: E731
            F.zip_with("u", cand["cu"], lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        # one dist evaluation per candidate; array_min over
        # (dist, cluster) structs is lexicographic, so equal distances
        # tie to the smaller cluster id
        scored = F.transform(
            cands,
            lambda cand: F.struct(
                dist_to(cand).alias("dist"),
                cand["cluster"].alias("cluster"),
            ),
        )
        return F.array_min(scored)

    assigned = None
    for it in range(iters):
        assigned = v.select(
            "vec_id", "u", best_of(centroids).alias("best")
        )
        if it == iters - 1:
            break
        means = (
            assigned.select(
                F.col("best")["cluster"].alias("cluster"),
                F.posexplode("u").alias("pos", "val"),
            )
            .groupBy("cluster", "pos")
            .agg(
                # non-negative units: truncating div == floor division
                F.call_function(
                    "div", F.sum("val"), F.count(F.lit(1))
                ).alias("mu")
            )
            .collect()  # k*dim rows — bounded, the next round's literals
        )
        by_cluster: dict[int, dict[int, int]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["mu"]
        centroids = [
            (c, [d[p] for p in sorted(d)])
            for c, d in sorted(by_cluster.items())
        ]
    return assigned.select(
        "vec_id",
        F.col("best")["cluster"].alias("cluster"),
        F.col("best")["dist"].alias("dist_units"),
    ).orderBy("vec_id")


def power_iteration_pc1(
    embs: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000,
    offset_units: int = 1_000,
    top_k: int = 10,
) -> DataFrame:
    """First principal direction of the (non-centered) corpus Gram
    matrix by matrix-free POWER ITERATION in exact fixed-point integer
    arithmetic — the 4th member of the iterative family (k-means,
    PageRank, BPE trainer), oracle-replayable superstep by superstep
    like the others: no float-summation order anywhere.

    Semantics: quantize ``u_ij = floor(x·scale) + offset_units``
    (non-negative by the same bound as ``kmeans_lloyd_fixedpoint``);
    seed ``v`` with the smallest-id vector; each superstep computes
    projections ``s_i = Σ_j u_ij·v_j`` (bigint fold in index order),
    the matrix-free Gram product ``w_j = Σ_i s_i·u_ij`` (exact
    decimal(38,0) accumulation — this sum grows with corpus size), and
    renormalizes ``v_j = (w_j · 2^20) div max_j(w_j)`` in integer
    floor division (all terms non-negative, so truncation == floor ==
    DuckDB ``//``). Returns the ``top_k`` rows by final projection
    (ties to the smaller id) — the documents most aligned with the
    corpus's dominant embedding direction.

    Scale shape (the 100 TB path): the projection pass is a
    ZERO-SHUFFLE codegen fold — ``v`` embeds as one plan-literal array
    (dim bigints, the same bounded-literal transport as the k-means
    centroids); the only shuffle per superstep is the dim-key ``w``
    aggregate whose dim rows return to the driver as the next round's
    literal (bounded collect). Top-k is TakeOrdered, not a global
    sort. Overflow: s_i <= dim·(2·scale)·2^20 ≈ 1.3e11; the w sum is
    decimal(38,0), good to 10^38 — no corpus size overflows it.
    """
    if iters < 1:
        raise ValueError(f"power_iteration_pc1: iters must be >= 1, got {iters}")
    u = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
            "long"
        )
        + F.lit(offset_units),
    )
    # persisted for the iters projection passes; handle is caller-owned
    # (clearCache), same contract as kmeans_lloyd_fixedpoint
    v = embs.select(F.col(id_col).alias("vec_id"), u.alias("u")).persist()
    min_unit = v.select(F.min(F.array_min("u")).alias("mn")).first()["mn"]
    if min_unit is not None and min_unit < 0:
        raise ValueError(
            f"power_iteration_pc1: quantized unit {min_unit} < 0 — "
            f"component below -offset_units/scale; raise offset_units"
        )
    vvec = [int(x) for x in v.orderBy("vec_id").limit(1).first()["u"]]

    def project(vec: list[int]):
        vlit = F.expr(
            "array(" + ",".join(f"{int(x)}L" for x in vec) + ")"
        )
        return F.aggregate(
            F.zip_with("u", vlit, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored = None
    for t in range(iters):
        scored = v.select("vec_id", "u", project(vvec).alias("s"))
        if t == iters - 1:
            break
        w_rows = (
            scored.select("s", F.posexplode("u").alias("pos", "val"))
            .groupBy("pos")
            .agg(
                F.sum(
                    (F.col("s") * F.col("val")).cast("decimal(38,0)")
                ).alias("w")
            )
            .collect()  # dim rows — bounded, the next round's literal
        )
        w = {int(r["pos"]): int(r["w"]) for r in w_rows}
        wv = [w[p] for p in sorted(w)]
        m = max(wv)
        if m <= 0:
            raise ValueError(
                "power_iteration_pc1: degenerate corpus — every Gram "
                "component is zero (all vectors quantize to 0); raise "
                "offset_units or check the input"
            )
        vvec = [(x << 20) // m for x in wv]
    top = scored.orderBy(F.desc("s"), F.asc("vec_id")).limit(top_k)
    rk = Window.orderBy(F.desc("s"), F.asc("vec_id"))  # top_k rows
    return (
        top.withColumn("rank", F.row_number().over(rk).cast("int"))
        .select("rank", "vec_id", F.col("s").alias("proj_units"))
        .orderBy("rank")
    )
