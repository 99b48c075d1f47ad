"""OPQ-layout maintenance coverage (r12 verdict #5 + r12 advisories):

* the layout guards are now symmetric — ``ivfpq_read`` /
  ``ivfpq_append`` / ``ivfpq_compact(opq=False)`` refuse a
  rotation-carrying sidecar exactly as ``opq_read`` refuses a plain
  one (r12 advisory: the old one-way guard let ``ivfpq_append`` encode
  unrotated residuals against rotated-residual codebooks — silently
  corrupted distances);
* ``rescale_cells`` geometry tracking on the OPQ layout (the shared
  implementation was only exercised through the plain path);
* the ``ivfpq_recover`` crash-state walk over a rotation-carrying
  layout — the one structural difference is the sidecar column
  ``opq_read`` refuses to live without, so recovery must preserve it;
* the rescale clamp for near-empty indexes (r12 advisory: n_cur=1 must
  fall back to sidecar geometry, never derive k > row count).
"""

import pytest

from near_event_streams_spark.operators import similarity
from near_event_streams_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb_halves(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    return (
        emb,
        emb.filter(emb.vec_id % 2 == 0),
        emb.filter(emb.vec_id % 2 == 1),
    )


@pytest.fixture(scope="module")
def opq_layout(spark, tmp_path_factory, emb_halves):
    """A persisted OPQ index built on half the corpus (module-scoped:
    the guard tests only read it)."""
    _, old, _ = emb_halves
    path = str(tmp_path_factory.mktemp("opqm") / "opqidx")
    enc, cents, rot, books = similarity.opq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    similarity.opq_write(enc, cents, rot, books, path)
    return path


def test_plain_readers_reject_opq_layout(spark, opq_layout, emb_halves):
    """ivfpq_read / ivfpq_append / ivfpq_compact(opq=False) must all
    raise on a rotation-carrying sidecar instead of silently doing
    rotation-less math on rotated-residual codes."""
    _, _, new = emb_halves
    with pytest.raises(ValueError, match="OPQ"):
        similarity.ivfpq_read(spark, opq_layout)
    with pytest.raises(ValueError, match="OPQ"):
        similarity.ivfpq_append(spark, opq_layout, new)
    with pytest.raises(ValueError, match="opq_compact"):
        similarity.ivfpq_compact(spark, opq_layout, new)
    # and the sanctioned paths still work on the same layout
    enc, cents, rot, books = similarity.opq_read(spark, opq_layout)
    assert rot.shape[0] == rot.shape[1]
    assert enc.count() > 0


def test_opq_compact_rejects_plain_layout(
    spark, tmp_path, emb_halves
):
    """The guard must cut BOTH ways (r13 review): ``opq_compact`` on a
    rotation-less sidecar would silently CONVERT the index type — the
    retrain writes a rotation, and every existing ``ivfpq_read`` /
    ``ivfpq_append`` consumer starts refusing the index after the
    maintenance job."""
    _, old, new = emb_halves
    path = str(tmp_path / "plainidx")
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    similarity.ivfpq_write(enc, cents, books, path)
    with pytest.raises(ValueError, match="ivfpq_compact"):
        similarity.opq_compact(spark, path, new)
    # the plain index is untouched and still readable by its own path
    enc2, _, _ = similarity.ivfpq_read(spark, path)
    assert enc2.count() == enc.count()


def test_opq_compact_rescale_cells_tracks_corpus_growth(
    spark, tmp_path, emb_halves
):
    """rescale_cells on the OPQ layout: append doubles the index, the
    compact re-derives ~sqrt(n) cells, and the rewritten sidecar still
    carries an ORTHOGONAL rotation that opq_read accepts and probes
    meet the shared recall bar with."""
    import numpy as np

    emb, old, new = emb_halves
    path = str(tmp_path / "opqidx")
    enc, cents, rot, books = similarity.opq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    similarity.opq_write(enc, cents, rot, books, path)
    similarity.opq_append(spark, path, new)

    res = similarity.opq_compact(
        spark, path, emb, seed=42, rescale_cells=True
    )
    n_total = emb.count()
    expect_cells = round(n_total**0.5)
    assert res["compacted"] is True
    assert res["n_clusters"] == expect_cells
    assert res["n_rows"] == n_total

    enc2, cents2, rot2, books2 = similarity.opq_read(spark, path)
    assert len(cents2) == expect_cells
    assert books2.shape[0] == 8 and books2.shape[1] == 256
    # rotation survived the rescale and is still orthogonal
    eye = rot2 @ rot2.T
    assert np.allclose(eye, np.eye(rot2.shape[0]), atol=1e-8)
    assert enc2.count() == n_total

    queries = emb.filter(emb.vec_id < 10)
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.brute_force_topk(queries, emb, k=5).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in similarity.opq_topk(
            queries, emb, k=5, nprobe=16, refine=4,
            index=(enc2, cents2, rot2, books2),
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.8


def _hfs(spark, p):
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path
    return hp, hp(p).getFileSystem(spark._jsc.hadoopConfiguration())


def test_recover_crash_states_on_opq_layout(spark, tmp_path, emb_halves):
    """The ivfpq_recover walk over a ROTATION-CARRYING layout: every
    resolution must leave a layout opq_read accepts (sidecar rotation
    intact), covering promote-tmp (crash between the renames) and
    restore-old (crash during the tmp build)."""
    emb, old_half, _ = emb_halves
    path = str(tmp_path / "opqidx")
    tmp, old = path + ".compact-tmp", path + ".compact-old"
    enc, cents, rot, books = similarity.opq_index(
        old_half, n_clusters=8, m=8, ks=256, seed=42
    )
    similarity.opq_write(enc, cents, rot, books, path)
    hp, fs = _hfs(spark, path)

    # crash between the renames: live renamed away, complete OPQ tmp
    # (a distinguishable 4-cell retrain) — recover must promote it
    enc4, cents4, rot4, books4 = similarity.opq_index(
        emb, n_clusters=4, m=8, ks=256, seed=42
    )
    similarity.opq_write(enc4, cents4, rot4, books4, tmp)
    assert fs.rename(hp(path), hp(old))
    assert similarity.ivfpq_recover(spark, path) == "promoted_tmp"
    assert not fs.exists(hp(tmp)) and not fs.exists(hp(old))
    enc_r, cents_r, rot_r, _ = similarity.opq_read(spark, path)
    assert len(cents_r) == 4 and rot_r is not None
    assert enc_r.count() == emb.count()

    # crash during the tmp build: incomplete tmp, live renamed away —
    # recover must restore the old (4-cell) OPQ index with its rotation
    assert fs.rename(hp(path), hp(old))
    fs.mkdirs(hp(tmp))
    spark.createDataFrame([(1,)], "x int").write.parquet(tmp + "/codes")
    assert similarity.ivfpq_recover(spark, path) == "restored_old"
    _, cents_o, rot_o, _ = similarity.opq_read(spark, path)
    assert len(cents_o) == 4 and rot_o is not None


def test_recover_validates_live_before_deleting_strays(
    spark, tmp_path, emb_halves
):
    """r12 advisory: a non-atomic rename (S3A copy+delete) can crash
    leaving a PARTIAL live dir whose /meta exists. With a complete tmp
    present, recover must detect the unreadable live layout and promote
    tmp instead of returning "ok" and deleting the only complete copy."""
    emb, old_half, _ = emb_halves
    path = str(tmp_path / "pqidx")
    tmp = path + ".compact-tmp"
    enc, cents, books = similarity.ivfpq_index(
        old_half, n_clusters=8, m=8, ks=256, seed=42
    )
    # complete new build stranded at tmp (the state a mid-rename crash
    # leaves on an object store), plus a PARTIAL live: meta copied,
    # codes directory missing
    similarity.ivfpq_write(enc, cents, books, tmp)
    hp, fs = _hfs(spark, path)
    fs.mkdirs(hp(path))
    spark.read.parquet(tmp + "/meta").coalesce(1).write.parquet(
        path + "/meta"
    )
    assert similarity.ivfpq_recover(spark, path) == "promoted_tmp"
    enc_r, cents_r, _ = similarity.ivfpq_read(spark, path)
    assert enc_r.count() == old_half.count()
    assert not fs.exists(hp(tmp))

    # and the healthy fast path still answers "ok" without strays
    assert similarity.ivfpq_recover(spark, path) == "ok"


def test_rescale_clamp_anchors_to_retrain_corpus(spark, tmp_path, emb_halves):
    """r12 advisory + r13 review: the ~sqrt(n) rescale derives n from
    the RETRAIN CORPUS — the table the new geometry will hold — never
    from the old index's codes count. A drained 1-row index compacted
    against the full lake gets full-corpus cells; a tiny corpus clamps
    k to its own row count; a <2-row corpus skips the compact outright
    (nothing to retrain from, and no k could be trainable)."""
    emb, old, _ = emb_halves
    n_total = emb.count()
    path = str(tmp_path / "pqidx")
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=4, m=8, ks=256, seed=42
    )
    similarity.ivfpq_write(enc, cents, books, path)

    # drain the CODES layout to one row; the raw corpus is intact —
    # cells must size from the corpus (sqrt(500) ~ 22), not sqrt(1)
    one = spark.read.parquet(path + "/codes").limit(1).collect()
    spark.createDataFrame(
        one, spark.read.parquet(path + "/codes").schema
    ).write.mode("overwrite").partitionBy("cluster").parquet(
        path + "/codes"
    )
    res = similarity.ivfpq_compact(
        spark, path, emb, seed=42, rescale_cells=True
    )
    assert res["compacted"] is True
    assert res["n_clusters"] == round(n_total**0.5)
    assert res["n_rows"] == n_total

    # 3-row corpus: k clamps to min(round(sqrt(3)), 3) = 2 — never
    # more centers than corpus rows
    tiny = emb.filter(emb.vec_id < 3)
    res3 = similarity.ivfpq_compact(
        spark, path, tiny, seed=42, rescale_cells=True
    )
    assert res3["compacted"] is True
    assert res3["n_clusters"] == 2
    assert res3["n_rows"] == 3

    # <2-row corpus: skip outright, layout untouched
    before = spark.read.parquet(path + "/codes").count()
    res1 = similarity.ivfpq_compact(
        spark,
        path,
        emb.filter(emb.vec_id < 1),
        seed=42,
        rescale_cells=True,
    )
    assert res1["compacted"] is False
    assert spark.read.parquet(path + "/codes").count() == before
