"""OPQ rotation discriminator (r10 verdict #6 / r11 Next #2).

On the near-isotropic synthetic `embeddings` table OPQ recall equals PQ
recall, so the gated `ann_opq_topk` row cannot distinguish a broken
rotation from a working one beyond orthogonality. This fixture is built
to be ANISOTROPIC with cross-subspace correlation — the regime OPQ (Ge
et al., CVPR 2013) exists for: latent variance decays exponentially
(scale 4 over 32 dims) and a seeded random orthogonal mixing matrix
spreads those correlated directions ACROSS the m=8 coordinate subspaces
PQ quantizes independently. Plain PQ then wastes its per-subspace
codebooks on correlated coordinates; OPQ's learned rotation re-aligns
them, and recall must be STRICTLY higher at the identical byte budget.

Measured at the pinned settings (seed 7 fixture, seed 42 training,
ks=16, refine=2, both coarse cells probed so coarse routing cancels
out): PQ recall 0.390, OPQ recall 0.580 — the assertion keeps a wide
margin below the observed +0.19 gap while staying strict.
"""

import numpy as np
import pytest

from near_event_streams_spark.operators import similarity


@pytest.fixture(scope="module")
def aniso(spark):
    rng = np.random.default_rng(7)
    dim, n = 32, 2000
    spec = np.exp(-np.arange(dim) / 4.0)
    z = rng.standard_normal((n, dim)) * np.sqrt(spec)
    q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    x = z @ q.T
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).persist()
    df.count()
    yield df, df.filter(df.vec_id < 20)
    df.unpersist()


def _recall(queries, corpus, fn):
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.brute_force_topk(queries, corpus, k=5).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in fn(
            queries,
            corpus,
            k=5,
            n_clusters=2,
            nprobe=2,
            m=8,
            ks=16,
            refine=2,
            seed=42,
        ).collect()
    }
    return len(exact & approx) / len(exact)


def test_opq_rotation_beats_plain_pq_on_anisotropic_data(aniso):
    corpus, queries = aniso
    pq = _recall(queries, corpus, similarity.ivfpq_topk)
    opq = _recall(queries, corpus, similarity.opq_topk)
    # sanity: the fixture is HARD for plain PQ at this byte budget —
    # if PQ itself scores high the fixture stopped discriminating
    assert pq < 0.6, f"fixture no longer anisotropic enough: pq={pq}"
    assert opq > pq, f"OPQ rotation did not lift recall: opq={opq} pq={pq}"
    assert opq - pq >= 0.05, (
        f"OPQ lift collapsed: opq={opq} pq={pq} "
        "(observed +0.19 at these settings)"
    )
