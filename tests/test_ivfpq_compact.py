"""ivfpq_compact verification — the retrain-and-swap maintenance path
for a persisted IVF-PQ index (`operators/similarity.py ivfpq_compact`;
the FAISS periodic-retrain shape, cf. reference `main.rs:122-138` for
the long-running-maintenance framing).

Covers the r10 done-criterion plus both r11 advisories:
  * build → append → compact → probe round-trip (recall meets the
    fresh-build bar; the sidecar's `n_rows` yardstick resets so the
    NEXT scheduled compact skips);
  * the `min_appended_frac` skip path leaves the layout byte-identical;
  * old-sidecar compatibility (meta written before `n_rows` existed);
  * determinism of the rewritten layout;
  * a session-level `partitionOverwriteMode=dynamic` cannot leave stale
    cluster directories behind (the compact writes to a side dir and
    swaps — it never in-place-overwrites the live hive layout);
  * the swap never leaves new codes under an old sidecar (codes and
    meta move together in one directory rename).
"""

import pytest

from near_event_streams_spark.operators import similarity
from near_event_streams_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _codes_rows(spark, path):
    return {
        r["vec_id"]: (int(r["cluster"]), bytes(r["codes"]), r["vec_norm"])
        for r in spark.read.parquet(path + "/codes").collect()
    }


def _recall_at_5(spark, emb, index):
    queries = emb.filter(emb.vec_id < 10)
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.brute_force_topk(queries, emb, k=5).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in similarity.ivfpq_topk(
            queries, emb, k=5, nprobe=12, refine=4, index=index
        ).collect()
    }
    return len(exact & approx) / len(exact)


@pytest.fixture(scope="module")
def emb_halves(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    return (
        emb,
        emb.filter(emb.vec_id % 2 == 0),
        emb.filter(emb.vec_id % 2 == 1),
    )


def test_compact_roundtrip_recall_and_bookkeeping(spark, tmp_path, emb_halves):
    """Build on half the corpus, append the other half (encoded against
    stale centroids), compact against the full corpus: the appended
    fraction must be measured correctly (~0.5), the rewritten index must
    hold the full corpus, probe recall must meet the fresh-build bar,
    and the sidecar's n_rows yardstick must reset so an immediate second
    scheduled compact SKIPS."""
    emb, old, new = emb_halves
    path = str(tmp_path / "pqidx")
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=16, m=8, ks=256, seed=42
    )
    similarity.ivfpq_write(enc, cents, books, path)
    similarity.ivfpq_append(spark, path, new)

    n_total = emb.count()
    res = similarity.ivfpq_compact(
        spark, path, emb, min_appended_frac=0.25, seed=42
    )
    assert res["compacted"] is True
    assert res["appended_frac"] == pytest.approx(0.5, abs=0.02)
    assert res["n_rows"] == n_total

    idx = similarity.ivfpq_read(spark, path)
    assert idx[0].count() == n_total
    # fresh-build recall bar (the whole point of compaction: appended
    # rows were routed by centroids trained before they existed)
    assert _recall_at_5(spark, emb, idx) >= 0.8

    # the sidecar n_rows reset: a scheduler calling compact again with
    # the same threshold must now hit the skip path (appended_frac 0.0)
    res2 = similarity.ivfpq_compact(
        spark, path, emb, min_appended_frac=0.25, seed=42
    )
    assert res2 == {
        "compacted": False,
        "appended_frac": 0.0,
        "n_rows": n_total,
        "n_clusters": 16,
        "drift_psi": None,
        # r16: the effective horizon rides in the result — rename-mode
        # seeds persist 1, and the default resolves to it
        "retain_versions": 1,
    }


def test_compact_skip_leaves_layout_untouched(spark, tmp_path, emb_halves):
    emb, old, _ = emb_halves
    path = str(tmp_path / "pqidx")
    enc, cents, books = similarity.ivfpq_index(old, n_clusters=8, m=8)
    similarity.ivfpq_write(enc, cents, books, path)
    before = _codes_rows(spark, path)
    res = similarity.ivfpq_compact(
        spark, path, emb, min_appended_frac=0.1
    )
    assert res["compacted"] is False
    assert res["appended_frac"] == 0.0
    assert _codes_rows(spark, path) == before


def test_compact_skip_never_scans_corpus(spark, tmp_path, emb_halves):
    """The scheduler's skip path must cost only the sidecar read + the
    codes count — with ``rescale_cells=True`` the √n geometry is
    derived from ``corpus.count()``, and deriving it BEFORE the
    ``min_appended_frac`` check would turn every checked-but-skipped
    ingest window into a full-lake scan (r13 review)."""
    emb, old, _ = emb_halves
    path = str(tmp_path / "pqidx")
    enc, cents, books = similarity.ivfpq_index(old, n_clusters=8, m=8)
    similarity.ivfpq_write(enc, cents, books, path)

    def _boom():
        raise AssertionError(
            "corpus.count() ran on the skip path — the scheduler "
            "check must come first"
        )

    emb.count = _boom  # instance-level trap; cleared with the fixture
    try:
        res = similarity.ivfpq_compact(
            spark, path, emb, min_appended_frac=0.1, rescale_cells=True
        )
    finally:
        del emb.count  # restore the class method for later tests
    assert res["compacted"] is False


def test_compact_old_sidecar_without_n_rows(spark, tmp_path, emb_halves):
    """A sidecar written before the n_rows field existed: the appended
    fraction is unknowable, so compaction must PROCEED even under a
    min_appended_frac threshold (conservative: unknown drift → retrain)
    and report appended_frac=None; geometry defaults must still come
    from the old sidecar."""
    emb, old, new = emb_halves
    path = str(tmp_path / "pqidx")
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    similarity.ivfpq_write(enc, cents, books, path)
    # rewrite the sidecar WITHOUT n_rows (the pre-r11 layout)
    legacy = spark.read.parquet(path + "/meta").drop("n_rows")
    legacy.toPandas().to_parquet(str(tmp_path / "legacy_meta.parquet"))
    (
        spark.read.parquet(str(tmp_path / "legacy_meta.parquet"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path + "/meta")
    )
    similarity.ivfpq_append(spark, path, new)

    res = similarity.ivfpq_compact(
        spark, path, emb, min_appended_frac=0.9
    )
    assert res["compacted"] is True
    assert res["appended_frac"] is None
    assert res["n_rows"] == emb.count()
    # geometry carried over from the legacy sidecar (n_clusters=8, m=8)
    enc2, cents2, books2 = similarity.ivfpq_read(spark, path)
    assert len(cents2) == 8
    assert books2.shape[0] == 8


def test_compact_rewritten_layout_deterministic(spark, tmp_path, emb_halves):
    """Two compacts from the same corpus/seed must produce identical
    codes rows and identical sidecar codebooks (seeded bounded training
    sample + stable argmin ties — same determinism contract as
    ivfpq_index)."""
    emb, old, new = emb_halves
    outs = []
    for sub in ("a", "b"):
        path = str(tmp_path / f"pqidx_{sub}")
        enc, cents, books = similarity.ivfpq_index(
            old, n_clusters=8, m=8, ks=256, seed=42
        )
        similarity.ivfpq_write(enc, cents, books, path)
        similarity.ivfpq_append(spark, path, new)
        similarity.ivfpq_compact(spark, path, emb, seed=42)
        rows = _codes_rows(spark, path)
        meta = spark.read.parquet(path + "/meta").collect()[0]
        outs.append((rows, meta["centroids"], meta["books"]))
    assert outs[0] == outs[1]


def test_compact_safe_under_dynamic_overwrite_mode(spark, tmp_path, emb_halves):
    """r11 advisory: with session partitionOverwriteMode='dynamic' an
    in-place overwrite would preserve cluster directories absent from
    the retrained layout — stale codes encoded against OLD codebooks
    under the NEW sidecar. The side-dir-and-swap compact (plus the
    static pin inside ivfpq_write) must leave EXACTLY the retrained
    rows: shrink the cluster count 16→4 so the old layout has dirs the
    new one lacks, then check no extra rows or clusters survive."""
    emb, _, _ = emb_halves
    path = str(tmp_path / "pqidx")
    enc, cents, books = similarity.ivfpq_index(
        emb, n_clusters=16, m=8, ks=256, seed=42
    )
    similarity.ivfpq_write(enc, cents, books, path)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        res = similarity.ivfpq_compact(
            spark, path, emb, n_clusters=4, seed=42
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    assert res["compacted"] is True
    assert res["n_rows"] == emb.count()
    back = spark.read.parquet(path + "/codes")
    assert back.count() == emb.count()
    clusters = {int(r["cluster"]) for r in back.select("cluster").distinct().collect()}
    assert clusters <= {0, 1, 2, 3}, f"stale cluster dirs survived: {clusters}"
    # and the sidecar matches the rewritten geometry — codes and meta
    # moved together in one directory swap
    meta = spark.read.parquet(path + "/meta").collect()[0]
    assert len(meta["centroids"]) == 4
    # caller's session conf untouched
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") == prev
    )


def test_compact_rescale_cells_tracks_corpus_growth(spark, tmp_path, emb_halves):
    """rescale_cells=True re-derives the cell count as ~sqrt(n) at
    compact time instead of inheriting the sidecar's frozen build-time
    geometry — the 100 TB story: an index built small and grown by
    appends must not keep its original (now undersized) cell count,
    or probes scan ever-longer cells. 500 rows -> round(sqrt(500)) =
    22 cells, up from the 8 the index was built with; probe recall at
    proportionally scaled nprobe must still meet the shared bar, and
    the PQ byte budget (m, ks) must be untouched."""
    emb, old, new = emb_halves
    path = str(tmp_path / "pqidx")
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    similarity.ivfpq_write(enc, cents, books, path)
    similarity.ivfpq_append(spark, path, new)

    res = similarity.ivfpq_compact(
        spark, path, emb, seed=42, rescale_cells=True
    )
    n_total = emb.count()
    expect_cells = round(n_total**0.5)
    assert res["compacted"] is True
    assert res["n_clusters"] == expect_cells
    assert res["n_rows"] == n_total

    enc2, cents2, books2 = similarity.ivfpq_read(spark, path)
    assert len(cents2) == expect_cells
    assert books2.shape[0] == 8 and books2.shape[1] == 256
    assert enc2.count() == n_total

    queries = emb.filter(emb.vec_id < 10)
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.brute_force_topk(queries, emb, k=5).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in similarity.ivfpq_topk(
            queries, emb, k=5, nprobe=16, refine=4,
            index=(enc2, cents2, books2),
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.8

    # explicit n_clusters always wins over the rescale heuristic
    res2 = similarity.ivfpq_compact(
        spark, path, emb, n_clusters=4, seed=42, rescale_cells=True
    )
    assert res2["n_clusters"] == 4
    assert len(similarity.ivfpq_read(spark, path)[1]) == 4


def _hfs(spark, p):
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path
    return hp, hp(p).getFileSystem(spark._jsc.hadoopConfiguration())


def test_recover_every_crash_state(spark, tmp_path, emb_halves):
    """ivfpq_recover resolves each state the compact swap can strand:
    healthy (stray dirs cleaned), crash BETWEEN the renames (live gone,
    complete tmp + old present -> the completed NEW build is promoted),
    crash DURING the tmp build (incomplete tmp, live renamed away ->
    the old index is restored), and nothing recoverable (raises)."""
    emb, old_half, _ = emb_halves
    path = str(tmp_path / "pqidx")
    tmp, old = path + ".compact-tmp", path + ".compact-old"
    enc, cents, books = similarity.ivfpq_index(
        old_half, n_clusters=8, m=8, ks=256, seed=42
    )
    similarity.ivfpq_write(enc, cents, books, path)
    live_rows = _codes_rows(spark, path)
    hp, fs = _hfs(spark, path)

    # healthy + stray old dir -> ok, stray removed
    similarity.ivfpq_write(enc, cents, books, old)
    assert similarity.ivfpq_recover(spark, path) == "ok"
    assert not fs.exists(hp(old))
    assert _codes_rows(spark, path) == live_rows

    # crash between the renames: live renamed to old, NEW build
    # complete at tmp (here: a 4-cell retrain, distinguishable)
    enc4, cents4, books4 = similarity.ivfpq_index(
        emb, n_clusters=4, m=8, ks=256, seed=42
    )
    similarity.ivfpq_write(enc4, cents4, books4, tmp)
    assert fs.rename(hp(path), hp(old))
    assert similarity.ivfpq_recover(spark, path) == "promoted_tmp"
    assert not fs.exists(hp(tmp)) and not fs.exists(hp(old))
    enc_r, cents_r, _ = similarity.ivfpq_read(spark, path)
    assert len(cents_r) == 4 and enc_r.count() == emb.count()

    # crash during the tmp build: incomplete tmp (codes, no meta),
    # live already renamed away -> restore old
    assert fs.rename(hp(path), hp(old))
    fs.mkdirs(hp(tmp))
    spark.createDataFrame([(1,)], "x int").write.parquet(tmp + "/codes")
    assert similarity.ivfpq_recover(spark, path) == "restored_old"
    assert not fs.exists(hp(tmp)) and not fs.exists(hp(old))
    assert len(similarity.ivfpq_read(spark, path)[1]) == 4

    # nothing recoverable
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        similarity.ivfpq_recover(spark, str(tmp_path / "nowhere"))


def test_refine_dedups_duplicate_corpus_ids(spark, emb_halves):
    """The exact-refine join fetches full vectors by cand_id from the
    caller's corpus; a production refine source is the LAKE, which
    legitimately holds a vec_id twice (cross-batch redelivery keeps
    each copy in its own batch partition). The join must not emit the
    duplicate at two ranks and evict a real neighbor (r13 review) —
    pinned by probing over a corpus with every row doubled: the top-k
    must be IDENTICAL to the clean-corpus probe."""
    from pyspark.sql import functions as F

    emb, old, _ = emb_halves
    corpus = emb.limit(200)
    queries = corpus.filter(F.col("vec_id") < 20)
    enc, cents, books = similarity.ivfpq_index(
        corpus, n_clusters=8, m=8, ks=256, seed=42
    )
    index = (enc, cents, books)
    clean = similarity.ivfpq_topk(
        queries, corpus, k=5, nprobe=4, refine=4, index=index
    ).collect()
    doubled = corpus.unionByName(corpus)  # every vec_id twice
    dup = similarity.ivfpq_topk(
        queries, doubled, k=5, nprobe=4, refine=4, index=index
    ).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["cand_id"], r["cos_sim"])
        for r in rows
    )
    assert key(dup) == key(clean)
    per_q = {}
    for r in dup:
        per_q.setdefault(r["query_id"], []).append(r["cand_id"])
    for q, cands in per_q.items():
        assert len(cands) == len(set(cands)), (q, cands)
