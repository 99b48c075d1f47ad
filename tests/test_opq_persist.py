"""OPQ index persistence/maintenance — the rotation-carrying twin of
the IVF-PQ paths (`opq_write` / `opq_read` / `opq_append` /
`opq_compact`, `operators/similarity.py`). Before r12 only plain
IVF-PQ could be persisted: a user choosing OPQ for its recall lift on
real embedding manifolds lost the entire build-once/probe-for-months
amortization and the compaction maintenance loop. Same cluster-
partitioned codes layout; the dim×dim rotation rides the sidecar."""

import numpy as np
import pytest

from near_event_streams_spark.operators import similarity
from near_event_streams_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _rows(df):
    return {
        r["vec_id"]: (int(r["cluster"]), bytes(r["codes"]), r["vec_norm"])
        for r in df.collect()
    }


def test_opq_persist_roundtrip_and_probe_identity(spark, tmp_path, emb):
    """write -> read must be lossless (codes, centroids, rotation,
    codebooks), the read-back rotation must still be orthogonal, and
    probing via index= must reproduce the fresh per-call build EXACTLY
    (deterministic seeded training on both paths)."""
    path = str(tmp_path / "opqidx")
    enc, cents, rot, books = similarity.opq_index(
        emb, n_clusters=8, m=8, ks=256, seed=42
    )
    similarity.opq_write(enc, cents, rot, books, path)
    enc2, cents2, rot2, books2 = similarity.opq_read(spark, path)

    assert _rows(enc2) == _rows(enc)
    assert cents2 == [[float(x) for x in c] for c in cents]
    np.testing.assert_allclose(rot2, rot, atol=1e-12)
    np.testing.assert_allclose(books2, books, atol=1e-12)
    dim = rot2.shape[0]
    np.testing.assert_allclose(rot2 @ rot2.T, np.eye(dim), atol=1e-8)

    queries = emb.filter(emb.vec_id < 10)
    fresh = {
        tuple(r)
        for r in similarity.opq_topk(
            queries, emb, k=5, n_clusters=8, nprobe=8, m=8, ks=256,
            refine=4, seed=42,
        ).collect()
    }
    pers = {
        tuple(r)
        for r in similarity.opq_topk(
            queries, emb, k=5, nprobe=8, refine=4,
            index=(enc2, cents2, rot2, books2),
        ).collect()
    }
    assert pers == fresh


def test_opq_append_preserves_and_extends(spark, tmp_path, emb):
    """Appended rows are encoded with the EXISTING rotation/codebooks
    (byte-identical to opq_encode directly), existing rows survive
    untouched, and the read-back index holds |old|+|new| rows."""
    old = emb.filter(emb.vec_id % 2 == 0)
    new = emb.filter(emb.vec_id % 2 == 1)
    path = str(tmp_path / "opqidx")
    enc, cents, rot, books = similarity.opq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    similarity.opq_write(enc, cents, rot, books, path)
    similarity.opq_append(spark, path, new)
    back, cents2, rot2, books2 = similarity.opq_read(spark, path)

    rows_old, rows_back = _rows(enc), _rows(back)
    assert len(rows_back) == old.count() + new.count()
    for vid, row in rows_old.items():
        assert rows_back[vid] == row, vid
    direct = _rows(similarity.opq_encode(new, cents2, rot2, books2))
    for vid, row in direct.items():
        assert rows_back[vid] == row, vid


def test_opq_compact_restores_and_schedules(spark, tmp_path, emb):
    """Half-build + append + scheduled compact: fires at the measured
    ~50% appended fraction, rewrites the full corpus, keeps the probe
    above the shared recall bar at standard settings, and the refreshed
    sidecar makes the immediate second scheduled compact skip. The
    swap protocol is shared with ivfpq_compact (ivfpq_recover covers
    both layouts)."""
    old = emb.filter(emb.vec_id % 2 == 0)
    new = emb.filter(emb.vec_id % 2 == 1)
    path = str(tmp_path / "opqidx")
    enc, cents, rot, books = similarity.opq_index(
        old, n_clusters=16, m=8, ks=256, seed=42
    )
    similarity.opq_write(enc, cents, rot, books, path)
    similarity.opq_append(spark, path, new)

    res = similarity.opq_compact(
        spark, path, emb, min_appended_frac=0.25, seed=42
    )
    n_total = emb.count()
    assert res["compacted"] is True
    assert res["appended_frac"] == pytest.approx(0.5, abs=0.02)
    assert res["n_rows"] == n_total

    idx = similarity.opq_read(spark, path)
    assert idx[0].count() == n_total
    dim = idx[2].shape[0]
    np.testing.assert_allclose(idx[2] @ idx[2].T, np.eye(dim), atol=1e-8)

    queries = emb.filter(emb.vec_id < 10)
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.brute_force_topk(queries, emb, k=5).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in similarity.opq_topk(
            queries, emb, k=5, nprobe=12, refine=4, index=idx
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.8

    res2 = similarity.opq_compact(
        spark, path, emb, min_appended_frac=0.25, seed=42
    )
    assert res2["compacted"] is False and res2["appended_frac"] == 0.0


def test_opq_read_rejects_plain_ivfpq_layout(spark, tmp_path, emb):
    """Probing PQ codes with OPQ math would silently return wrong
    distances — opq_read must refuse a rotation-less sidecar. And the
    plain sidecar must stay byte-compatible: no rot column appears
    unless the OPQ path wrote one."""
    path = str(tmp_path / "pqidx")
    enc, cents, books = similarity.ivfpq_index(emb, n_clusters=8, m=8)
    similarity.ivfpq_write(enc, cents, books, path)
    meta = spark.read.parquet(path + "/meta")
    assert "rot" not in meta.columns
    with pytest.raises(ValueError, match="plain IVF-PQ"):
        similarity.opq_read(spark, path)
