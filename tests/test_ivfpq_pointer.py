"""Pointer-flip swap protocol for persisted ANN indexes (r13 verdict
Next #2): on object stores a directory "rename" is a non-atomic
client-side copy+delete, so the rename-swap compact's crash guarantee
does not hold there. ``swap_mode="pointer"`` keeps codes/meta in a
versioned prefix ``<path>/v<N>`` named by a single-object ``_CURRENT``
pointer; compacts build ``v<N+1>`` and flip the pointer with one
atomic PUT. This file walks the pointer twin of every rename-mode
guarantee: transparent resolution for read/append/probe, the compact
roundtrip, and the full crash-state recovery walk — plus the r14
``ok_discarded_retrain`` signal on BOTH protocols and the r14 drift
OR-trigger for the compact scheduler.

Reference framing: restart resilience is the reference's own recovery
story (``configs.rs:101-127``); the pointer protocol is how that
generalizes to S3-class storage at the 100 TB target.
"""

import pytest
from pyspark.sql import functions as F

from near_event_streams_spark.operators import similarity
from near_event_streams_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _codes_rows(spark, base):
    return {
        r["vec_id"]: (int(r["cluster"]), bytes(r["codes"]), r["vec_norm"])
        for r in spark.read.parquet(base + "/codes").collect()
    }


def _recall_at_5(spark, emb, index, nprobe=12):
    queries = emb.filter(emb.vec_id < 10)
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.brute_force_topk(queries, emb, k=5).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in similarity.ivfpq_topk(
            queries, emb, k=5, nprobe=nprobe, refine=4, index=index
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


def _hfs(spark, p):
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path
    return hp, hp(p).getFileSystem(spark._jsc.hadoopConfiguration())


def test_pointer_write_resolves_identically_to_rename(
    spark, tmp_path, emb_halves
):
    """The same build persisted under both protocols must hand back
    byte-identical codes rows and sidecar geometry through the SAME
    reader call — readers never see version dirs."""
    emb, old, _ = emb_halves
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    p_ren = str(tmp_path / "ren")
    p_ptr = str(tmp_path / "ptr")
    similarity.ivfpq_write(enc, cents, books, p_ren)
    similarity.ivfpq_write(enc, cents, books, p_ptr, swap_mode="pointer")

    assert similarity.resolve_index_base(spark, p_ren) == p_ren
    assert similarity.resolve_index_base(spark, p_ptr) == p_ptr + "/v0"

    a = similarity.ivfpq_read(spark, p_ren)
    b = similarity.ivfpq_read(spark, p_ptr)
    assert _codes_rows(spark, p_ren) == _codes_rows(spark, p_ptr + "/v0")
    assert a[1] == b[1]
    assert (a[2] == b[2]).all()

    # append resolves through the pointer too
    _, _, new = emb_halves
    similarity.ivfpq_append(spark, p_ptr, new)
    assert (
        spark.read.parquet(p_ptr + "/v0/codes").count() == emb.count()
    )


def test_pointer_rewrite_over_live_layout_bumps_version(
    spark, tmp_path, emb_halves
):
    """Re-seeding over an existing pointer layout must write the NEXT
    version — never mix two builds in one version prefix — and its
    post-flip sweep honors the horizon it stamps (r16: the default
    pointer horizon of 2 keeps the superseded build one cycle as
    reader grace; an explicit horizon-1 re-seed deletes immediately)."""
    _, old, new = emb_halves
    p = str(tmp_path / "ptr")
    enc, cents, books = similarity.ivfpq_index(old, n_clusters=8, m=8)
    similarity.ivfpq_write(enc, cents, books, p, swap_mode="pointer")
    enc2, cents2, books2 = similarity.ivfpq_index(new, n_clusters=4, m=8)
    similarity.ivfpq_write(enc2, cents2, books2, p, swap_mode="pointer")
    assert similarity.resolve_index_base(spark, p) == p + "/v1"
    # default horizon 2: the superseded v0 survives as the grace copy
    assert similarity._list_versions(spark, p) == [0, 1]
    assert len(similarity.ivfpq_read(spark, p)[1]) == 4
    # explicit delete-immediately re-seed sweeps everything but live
    similarity.ivfpq_write(
        enc, cents, books, p, swap_mode="pointer", retain_versions=1
    )
    assert similarity.resolve_index_base(spark, p) == p + "/v2"
    assert similarity._list_versions(spark, p) == [2]
    assert len(similarity.ivfpq_read(spark, p)[1]) == 8


def test_pointer_compact_roundtrip_and_skip(spark, tmp_path, emb_halves):
    """Build on half, append the other half, compact: the pointer must
    flip v0 -> v1, the superseded dir RETAINED (pointer mode's r16
    persisted default horizon is 2 — one compact cycle of stale-reader
    grace), the appended fraction measured (~0.5), probe recall meets
    the fresh-build bar, and an immediate second scheduled compact
    SKIPS (n_rows yardstick reset) without creating a v2."""
    emb, old, new = emb_halves
    p = str(tmp_path / "ptr")
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=16, m=8, ks=256, seed=42
    )
    similarity.ivfpq_write(enc, cents, books, p, swap_mode="pointer")
    similarity.ivfpq_append(spark, p, new)

    n_total = emb.count()
    res = similarity.ivfpq_compact(
        spark, p, emb, min_appended_frac=0.25, seed=42
    )
    assert res["compacted"] is True
    assert res["appended_frac"] == pytest.approx(0.5, abs=0.02)
    assert res["n_rows"] == n_total
    assert res["retain_versions"] == 2  # pointer seed's persisted default
    assert similarity.resolve_index_base(spark, p) == p + "/v1"
    assert similarity._list_versions(spark, p) == [0, 1]

    idx = similarity.ivfpq_read(spark, p)
    assert idx[0].count() == n_total
    assert _recall_at_5(spark, emb, idx) >= 0.8

    res2 = similarity.ivfpq_compact(
        spark, p, emb, min_appended_frac=0.25, seed=42
    )
    assert res2["compacted"] is False
    assert res2["appended_frac"] == 0.0
    assert similarity._list_versions(spark, p) == [0, 1]


def test_pointer_recover_every_crash_state(spark, tmp_path, emb_halves):
    """The pointer twin of the rename-mode crash walk, via the actual
    compact fault-injection seams:

    * crash BEFORE the flip — complete unreferenced v1 beside live v0:
      recover DISCARDS the finished retrain (live is authoritative —
      it may carry appends newer than the build) and says so;
    * crash AFTER the flip — pointer at v1, superseded v0: a
      default-horizon recover RETAINS it (within the persisted
      pointer-mode grace window of 2 — r16: recovery finishes the
      crashed compact's own cleanup, which would have kept it too),
      plain "ok";
    * incomplete build stray (codes, no sidecar): deleted, "ok";
    * garbled pointer: readers REFUSE (no silent misread), recover
      repoints to the highest complete version;
    * pointer file lost entirely: same repoint;
    * nothing recoverable: FileNotFoundError."""
    emb, old, _ = emb_halves
    p = str(tmp_path / "ptr")
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    similarity.ivfpq_write(enc, cents, books, p, swap_mode="pointer")
    live_rows = _codes_rows(spark, p + "/v0")
    hp, fs = _hfs(spark, p)

    # healthy, no strays -> ok
    assert similarity.ivfpq_recover(spark, p) == "ok"

    # crash BEFORE the flip: finished retrain at v1, pointer still v0
    with pytest.raises(IOError, match="before pointer flip"):
        similarity.ivfpq_compact(spark, p, emb, seed=42, _crash_before_swap=True)
    assert similarity._list_versions(spark, p) == [0, 1]
    assert similarity.ivfpq_recover(spark, p) == "ok_discarded_retrain"
    assert similarity._list_versions(spark, p) == [0]
    assert _codes_rows(spark, p + "/v0") == live_rows

    # crash AFTER the flip: pointer already at v1, stray v0 remains
    with pytest.raises(IOError, match="after pointer flip"):
        similarity.ivfpq_compact(
            spark, p, emb, seed=42, _crash_between_renames=True
        )
    assert similarity.resolve_index_base(spark, p) == p + "/v1"
    assert similarity._list_versions(spark, p) == [0, 1]
    # v0 is in-horizon history (persisted pointer default 2): the
    # default recover keeps it — finishing exactly the cleanup the
    # crashed compact itself would have done
    assert similarity.ivfpq_recover(spark, p) == "ok"
    assert similarity._list_versions(spark, p) == [0, 1]
    assert similarity.ivfpq_read(spark, p)[0].count() == emb.count()

    # incomplete stray NEWER than the pointer (codes dir, no sidecar)
    # -> deleted, plain ok; the in-horizon v0 still survives
    spark.createDataFrame([(1,)], "x int").write.parquet(p + "/v2/codes")
    assert similarity.ivfpq_recover(spark, p) == "ok"
    assert similarity._list_versions(spark, p) == [0, 1]

    # garbled pointer: resolve refuses; recover repoints
    out = fs.create(hp(p + "/_CURRENT"), True)
    out.write(bytearray(b"vgarbage!!"))
    out.close()
    with pytest.raises(IOError, match="garbled index pointer"):
        similarity.resolve_index_base(spark, p)
    assert similarity.ivfpq_recover(spark, p) == "repointed"
    assert similarity.resolve_index_base(spark, p) == p + "/v1"

    # pointer lost entirely -> repointed to highest complete version
    fs.delete(hp(p + "/_CURRENT"), False)
    assert similarity.ivfpq_recover(spark, p) == "repointed"
    assert similarity.resolve_index_base(spark, p) == p + "/v1"

    # nothing recoverable
    with pytest.raises(FileNotFoundError):
        similarity.ivfpq_recover(spark, str(tmp_path / "nowhere"))


def test_rename_recover_signals_discarded_retrain(
    spark, tmp_path, emb_halves
):
    """r13 verdict #5: a compact that dies BEFORE its first rename
    leaves the live index authoritative and a COMPLETE build at tmp —
    previously recover silently deleted the finished retrain under a
    plain "ok". The state must now be visible in the return value,
    and the live index must be untouched."""
    emb, old, _ = emb_halves
    p = str(tmp_path / "ren")
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    similarity.ivfpq_write(enc, cents, books, p)
    live_rows = _codes_rows(spark, p)

    with pytest.raises(IOError, match="before first compact rename"):
        similarity.ivfpq_compact(
            spark, p, emb, seed=42, _crash_before_swap=True
        )
    import os

    assert os.path.exists(p + ".compact-tmp/meta")
    assert similarity.ivfpq_recover(spark, p) == "ok_discarded_retrain"
    assert not os.path.exists(p + ".compact-tmp")
    assert _codes_rows(spark, p) == live_rows
    # an INCOMPLETE tmp stray still reports plain ok
    spark.createDataFrame([(1,)], "x int").write.parquet(
        p + ".compact-tmp/codes"
    )
    assert similarity.ivfpq_recover(spark, p) == "ok"


def test_opq_pointer_roundtrip_and_compact(spark, tmp_path, emb_halves):
    """OPQ layouts carry the rotation sidecar through the pointer
    protocol unchanged: write → read 4-tuple → compact flips the
    pointer and keeps the rotation column."""
    emb, old, new = emb_halves
    p = str(tmp_path / "optr")
    enc, cents, rot, books = similarity.opq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    similarity.opq_write(enc, cents, rot, books, p, swap_mode="pointer")
    enc_r, cents_r, rot_r, books_r = similarity.opq_read(spark, p)
    assert (rot_r == rot).all()
    # the plain reader still refuses the rotation THROUGH the pointer
    with pytest.raises(ValueError, match="OPQ index"):
        similarity.ivfpq_read(spark, p)

    similarity.opq_append(spark, p, new)
    res = similarity.opq_compact(
        spark, p, emb, min_appended_frac=0.25, seed=42
    )
    assert res["compacted"] is True
    assert similarity.resolve_index_base(spark, p) == p + "/v1"
    _, _, rot2, _ = similarity.opq_read(spark, p)
    assert rot2.shape == rot.shape


def _shift_first_dims(df, delta=0.25, ndims=8):
    """The SCALE.md r13 drift fixture: +2 sigma (~0.25) on the first 8
    of 64 dims — appends from a distribution the standing geometry
    never saw."""
    return df.withColumn(
        "embedding",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: F.when(i < F.lit(ndims), x + F.lit(delta)).otherwise(
                x
            ),
        ),
    )


def test_drift_trigger_fires_on_drift_not_on_iid(
    spark, tmp_path, emb_halves
):
    """r13 verdict Next #4: the volume trigger (min_appended_frac) is
    blind to WHAT was appended, yet erosion is a drift phenomenon
    (SCALE.md r13: iid appends don't erode; +2σ on 8/64 dims erodes
    0.666→0.528 until a compact). The PSI drift trigger — appended
    rows' coarse-cell occupancy vs the at-write baseline, computed
    from parquet footers only — must NOT fire on iid appends, MUST
    fire on the +2σ fixture, and the fired compact must restore the
    recall the fresh build gets on the drifted corpus."""
    emb, old, new = emb_halves
    DRIFT = 0.25  # the classic PSI "action" band

    # --- iid appends: drift trigger stays quiet ---------------------
    p_iid = str(tmp_path / "iid")
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=16, m=8, ks=256, seed=42
    )
    similarity.ivfpq_write(enc, cents, books, p_iid)
    similarity.ivfpq_append(spark, p_iid, new)
    # drift-only scheduler (volume unarmed): must NOT be due
    assert (
        similarity.compact_due(
            spark, p_iid, None, drift_psi_threshold=DRIFT
        )
        is False
    )
    # volume trigger still works independently on the same gate
    assert similarity.compact_due(spark, p_iid, 0.25) is True

    # --- drifted appends: trigger fires, compact restores -----------
    p_dr = str(tmp_path / "dr")
    similarity.ivfpq_write(enc, cents, books, p_dr)
    drifted = _shift_first_dims(new.select("vec_id", "embedding"))
    similarity.ivfpq_append(spark, p_dr, drifted)
    assert (
        similarity.compact_due(spark, p_dr, None, drift_psi_threshold=DRIFT)
        is True
    )
    # the fired compact reports the PSI and retrains even though the
    # volume threshold alone (0.9) would have skipped
    emb_dr = old.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    ).unionByName(drifted)
    res = similarity.ivfpq_compact(
        spark,
        p_dr,
        emb_dr,
        min_appended_frac=0.9,
        drift_psi_threshold=DRIFT,
        seed=42,
    )
    assert res["compacted"] is True
    assert res["drift_psi"] is not None and res["drift_psi"] >= DRIFT
    # restored: the compacted index matches a fresh build on the
    # drifted corpus (same seed → same deterministic training sample)
    r_compacted = _recall_at_5(
        spark, emb_dr, similarity.ivfpq_read(spark, p_dr), nprobe=12
    )
    p_fresh = str(tmp_path / "fresh")
    enc_f, c_f, b_f = similarity.ivfpq_index(
        emb_dr, n_clusters=16, m=8, ks=256, seed=42
    )
    similarity.ivfpq_write(enc_f, c_f, b_f, p_fresh)
    r_fresh = _recall_at_5(
        spark, emb_dr, similarity.ivfpq_read(spark, p_fresh), nprobe=12
    )
    assert r_compacted == pytest.approx(r_fresh, abs=1e-9)

    # --- legacy sidecar (no cell_counts): drift unobservable --------
    legacy_meta = spark.read.parquet(p_iid + "/meta").drop("cell_counts")
    legacy_meta.toPandas().to_parquet(str(tmp_path / "legacy.parquet"))
    (
        spark.read.parquet(str(tmp_path / "legacy.parquet"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(p_iid + "/meta")
    )
    # drift-ONLY scheduler: the armed trigger is UNOBSERVABLE on this
    # sidecar, and `due=False forever` would be a silently-inert knob
    # (r14 advisory) — the gate must refuse, not stall
    with pytest.raises(ValueError, match="cell_counts"):
        similarity.compact_due(spark, p_iid, None, drift_psi_threshold=DRIFT)
    # with the volume fallback armed the gate proceeds (drift side
    # logged as unobservable) and volume decides
    assert similarity.compact_due(spark, p_iid, 0.25, DRIFT) is True
    assert similarity.compact_due(spark, p_iid, 0.95, DRIFT) is False


def test_write_refuses_protocol_mixing(spark, tmp_path, emb_halves):
    """A rename-mode write over a pointer layout would land codes/meta
    at the root where pointer resolution never looks (silently
    invisible data); a pointer write over a rename layout strands the
    root layout as shadow debris. Both directions must refuse."""
    _, old, _ = emb_halves
    enc, cents, books = similarity.ivfpq_index(old, n_clusters=4, m=8)

    p1 = str(tmp_path / "ptr")
    similarity.ivfpq_write(enc, cents, books, p1, swap_mode="pointer")
    with pytest.raises(ValueError, match="pointer-mode index"):
        similarity.ivfpq_write(enc, cents, books, p1)

    p2 = str(tmp_path / "ren")
    similarity.ivfpq_write(enc, cents, books, p2)
    with pytest.raises(ValueError, match="rename-mode index"):
        similarity.ivfpq_write(enc, cents, books, p2, swap_mode="pointer")

    with pytest.raises(ValueError, match="swap_mode"):
        similarity.ivfpq_write(
            enc, cents, books, str(tmp_path / "x"), swap_mode="s3"
        )


# ---------------------------------------------------------------------------
# retain_versions: the stale-reader grace window (r14 verdict Next #1)
# ---------------------------------------------------------------------------


def test_pointer_retention_concurrent_reader_survives_compact(
    spark, tmp_path, emb_halves
):
    """A long-running probe job resolves the pointer ONCE and then
    scans for hours; pointer-mode compact used to delete the
    superseded version dir immediately after the flip, yanking the
    reader's files mid-scan. With retain_versions=2 the pre-flip base
    stays fully readable for one compact cycle (true snapshot
    isolation: version-dir paths never mutate), and the NEXT compact's
    horizon sweep reclaims it."""
    emb, old, new = emb_halves
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    p = str(tmp_path / "ptr_retain")
    similarity.ivfpq_write(enc, cents, books, p, swap_mode="pointer")
    similarity.ivfpq_append(spark, p, new.select("vec_id", "embedding"))

    # the concurrent reader: resolves the live base BEFORE the compact
    pre_base = similarity.resolve_index_base(spark, p)
    assert pre_base == p + "/v0"
    pre_rows = _codes_rows(spark, pre_base)

    res = similarity.ivfpq_compact(spark, p, emb, seed=42, retain_versions=2)
    assert res["compacted"]
    assert similarity.resolve_index_base(spark, p) == p + "/v1"
    assert similarity._list_versions(spark, p) == [0, 1]
    # the reader finishes its scan against the PRE-FLIP base: every
    # file it resolved is still there, byte-identical
    assert _codes_rows(spark, pre_base) == pre_rows
    # and the retained layout is a complete index, not a husk
    idx_old = similarity.ivfpq_read(spark, pre_base, _resolved=True)
    assert idx_old[0].count() == len(pre_rows)

    # the NEXT compact's horizon sweep reclaims v0 (live v2 + grace v1)
    res2 = similarity.ivfpq_compact(spark, p, emb, seed=42, retain_versions=2)
    assert res2["compacted"]
    assert similarity._list_versions(spark, p) == [1, 2]
    # the DEFAULT horizon is now the persisted one (2, stamped by the
    # compacts above) — a no-arg compact keeps the grace window
    res3 = similarity.ivfpq_compact(spark, p, emb, seed=42)
    assert res3["compacted"]
    assert res3["retain_versions"] == 2
    assert similarity._list_versions(spark, p) == [2, 3]
    # an explicitly NARROWER horizon overrides (loudly — see the
    # mismatch-warn test) and reclaims everything but live
    res4 = similarity.ivfpq_compact(spark, p, emb, seed=42, retain_versions=1)
    assert res4["compacted"]
    assert similarity._list_versions(spark, p) == [4]
    # ...and is now the persisted horizon for the next default call
    assert similarity._sidecar_horizon(spark, p + "/v4") == 1


def test_ivfpq_vacuum_pins_the_horizon(spark, tmp_path, emb_halves):
    """ivfpq_vacuum is the explicit storage lever: it reclaims exactly
    the versions outside retain_versions, never the live one, and
    never versions newer than the pointer (a concurrent compact's
    in-flight build)."""
    emb, old, _ = emb_halves
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    p = str(tmp_path / "ptr_vac")
    similarity.ivfpq_write(enc, cents, books, p, swap_mode="pointer")
    for _ in range(3):  # v1, v2, v3 — deep history via wide horizon
        similarity.ivfpq_compact(spark, p, emb, seed=42, retain_versions=10)
    assert similarity._list_versions(spark, p) == [0, 1, 2, 3]

    # an in-flight newer build (concurrent compact mid-write): vacuum
    # must not touch it
    enc2, c2, b2 = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=7
    )
    similarity.ivfpq_write(enc2, c2, b2, p + "/v9")

    assert similarity.ivfpq_vacuum(spark, p, retain_versions=3) == 1  # v0
    assert similarity._list_versions(spark, p) == [1, 2, 3, 9]
    assert similarity.ivfpq_vacuum(spark, p, retain_versions=1) == 2  # v1,v2
    assert similarity._list_versions(spark, p) == [3, 9]
    assert similarity.ivfpq_vacuum(spark, p) == 0  # idempotent
    # live untouched and still readable throughout
    assert similarity.resolve_index_base(spark, p) == p + "/v3"
    similarity.ivfpq_read(spark, p)
    with pytest.raises(ValueError, match="retain_versions"):
        similarity.ivfpq_vacuum(spark, p, retain_versions=0)


def test_recover_respects_retention_horizon(spark, tmp_path, emb_halves):
    """ivfpq_recover with the maintenance jobs' horizon keeps retained
    history; the horizon never protects an unflipped retrain (newer
    than the pointer), which is always discarded with the visible
    signal."""
    emb, old, _ = emb_halves
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    p = str(tmp_path / "ptr_rec_ret")
    similarity.ivfpq_write(enc, cents, books, p, swap_mode="pointer")
    similarity.ivfpq_compact(spark, p, emb, seed=42, retain_versions=2)
    assert similarity._list_versions(spark, p) == [0, 1]

    # same-horizon recover: retained v0 survives
    assert similarity.ivfpq_recover(spark, p, retain_versions=2) == "ok"
    assert similarity._list_versions(spark, p) == [0, 1]

    # a finished-but-unflipped retrain beside the retained history is
    # STILL discarded under any horizon — it is not history
    crashed = False
    try:
        similarity.ivfpq_compact(
            spark, p, emb, seed=42, retain_versions=2,
            _crash_before_swap=True,
        )
    except IOError:
        crashed = True
    assert crashed
    assert similarity._list_versions(spark, p) == [0, 1, 2]
    assert (
        similarity.ivfpq_recover(spark, p, retain_versions=2)
        == "ok_discarded_retrain"
    )
    assert similarity._list_versions(spark, p) == [0, 1]

    # r16 (r15 verdict #2): a NO-ARGUMENT recover honors the PERSISTED
    # horizon — it can never reclaim history the maintenance jobs'
    # compacts deliberately kept just because a caller forgot the flag
    assert similarity.ivfpq_recover(spark, p) == "ok"
    assert similarity._list_versions(spark, p) == [0, 1]
    # reclaiming now requires an EXPLICIT narrower horizon (warned)
    assert similarity.ivfpq_recover(spark, p, retain_versions=1) == "ok"
    assert similarity._list_versions(spark, p) == [1]


def test_rename_mode_grace_slot_and_vacuum(spark, tmp_path, emb_halves):
    """Rename mode's one previous-version slot: retain_versions=2
    keeps <path>.compact-old as a complete rollback copy (an explicit
    contract since r15), the next compact's pre-clean replaces it, an
    explicitly-narrower vacuum reclaims it (the default honors the
    persisted horizon, r16), and horizons deeper than the slot
    refuse."""
    emb, old, new = emb_halves
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    p = str(tmp_path / "ren_retain")
    similarity.ivfpq_write(enc, cents, books, p)
    similarity.ivfpq_append(spark, p, new.select("vec_id", "embedding"))
    pre_rows = _codes_rows(spark, p)

    with pytest.raises(ValueError, match="pointer"):
        similarity.ivfpq_compact(spark, p, emb, seed=42, retain_versions=3)

    res = similarity.ivfpq_compact(spark, p, emb, seed=42, retain_versions=2)
    assert res["compacted"]
    hp, fs = _hfs(spark, p)
    assert fs.exists(hp(p + ".compact-old"))
    # the rollback copy is the COMPLETE pre-compact index
    assert _codes_rows(spark, p + ".compact-old") == pre_rows
    # recover at the same horizon leaves the grace copy alone — and so
    # do the DEFAULT recover and vacuum, which honor the horizon the
    # compact persisted (r16)
    assert similarity.ivfpq_recover(spark, p, retain_versions=2) == "ok"
    assert fs.exists(hp(p + ".compact-old"))
    assert similarity.ivfpq_recover(spark, p) == "ok"
    assert similarity.ivfpq_vacuum(spark, p) == 0
    assert fs.exists(hp(p + ".compact-old"))
    # reclaiming takes an EXPLICIT narrower horizon (warned)
    assert similarity.ivfpq_vacuum(spark, p, retain_versions=1) == 1
    assert not fs.exists(hp(p + ".compact-old"))
    assert similarity.ivfpq_vacuum(spark, p, retain_versions=1) == 0


# ---------------------------------------------------------------------------
# r16: the retention horizon is PERSISTED in the sidecar (r15 verdict #2)
# ---------------------------------------------------------------------------


def test_horizon_persisted_at_seed_and_compact(spark, tmp_path, emb_halves):
    """ivfpq_write stamps the horizon into the sidecar — 2 by default
    in pointer mode (shared-store grace window), 1 in rename mode —
    and every compact re-stamps its effective horizon, so the layout
    itself carries the durability contract instead of every caller
    having to repeat a flag."""
    _, old, _ = emb_halves
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    p_ptr = str(tmp_path / "ptr")
    p_ren = str(tmp_path / "ren")
    similarity.ivfpq_write(enc, cents, books, p_ptr, swap_mode="pointer")
    similarity.ivfpq_write(enc, cents, books, p_ren)
    assert similarity._sidecar_horizon(spark, p_ptr + "/v0") == 2
    assert similarity._sidecar_horizon(spark, p_ren) == 1

    # explicit seed horizons persist too; invalid ones refuse at write
    p3 = str(tmp_path / "ptr3")
    similarity.ivfpq_write(
        enc, cents, books, p3, swap_mode="pointer", retain_versions=3
    )
    assert similarity._sidecar_horizon(spark, p3 + "/v0") == 3
    with pytest.raises(ValueError, match="retain_versions"):
        similarity.ivfpq_write(
            enc, cents, books, str(tmp_path / "bad"), retain_versions=0
        )
    with pytest.raises(ValueError, match="one previous-version slot"):
        similarity.ivfpq_write(
            enc, cents, books, str(tmp_path / "bad2"), retain_versions=3
        )


def test_explicit_narrower_horizon_warns(spark, tmp_path, emb_halves, caplog):
    """An explicit retain_versions NARROWER than the persisted horizon
    is about to reclaim history the scheduled compacts deliberately
    kept — it still takes effect (the override is the storage lever),
    but loudly, on compact, vacuum AND recover."""
    import logging

    emb, old, _ = emb_halves
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    p = str(tmp_path / "ptr")
    similarity.ivfpq_write(
        enc, cents, books, p, swap_mode="pointer", retain_versions=3
    )
    logger = similarity.log.name
    with caplog.at_level(logging.WARNING, logger=logger):
        caplog.clear()
        res = similarity.ivfpq_compact(spark, p, emb, seed=42, retain_versions=2)
        assert res["compacted"] and res["retain_versions"] == 2
        assert any("NARROWER" in r.message for r in caplog.records)
    # matching or wider explicit horizons stay quiet
    with caplog.at_level(logging.WARNING, logger=logger):
        caplog.clear()
        similarity.ivfpq_compact(spark, p, emb, seed=42, retain_versions=2)
        assert similarity.ivfpq_vacuum(spark, p, retain_versions=2) == 0
        assert not any("NARROWER" in r.message for r in caplog.records)
    assert similarity._list_versions(spark, p) == [1, 2]
    with caplog.at_level(logging.WARNING, logger=logger):
        caplog.clear()
        assert similarity.ivfpq_recover(spark, p, retain_versions=1) == "ok"
        assert any("NARROWER" in r.message for r in caplog.records)
    assert similarity._list_versions(spark, p) == [2]
    with caplog.at_level(logging.WARNING, logger=logger):
        caplog.clear()
        assert similarity.ivfpq_vacuum(spark, p, retain_versions=1) == 0
        assert any("NARROWER" in r.message for r in caplog.records)


def test_legacy_sidecar_defaults_to_horizon_one(spark, tmp_path, emb_halves):
    """Pre-r16 sidecars carry no persisted horizon: default-horizon
    maintenance resolves to 1 — byte-for-byte the old behavior — until
    a write/compact stamps one. (The upgrade path is one compact.)"""
    emb, old, _ = emb_halves
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    p = str(tmp_path / "legacy_ptr")
    similarity.ivfpq_write(enc, cents, books, p, swap_mode="pointer")
    # strip the r16 column to fake a pre-r16 layout
    legacy = spark.read.parquet(p + "/v0/meta").drop("retain_versions")
    legacy.toPandas().to_parquet(str(tmp_path / "legacy.parquet"))
    (
        spark.read.parquet(str(tmp_path / "legacy.parquet"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(p + "/v0/meta")
    )
    assert similarity._sidecar_horizon(spark, p + "/v0") is None
    res = similarity.ivfpq_compact(spark, p, emb, seed=42)
    assert res["compacted"] and res["retain_versions"] == 1
    # old default behavior: superseded version reclaimed immediately —
    # and the compact STAMPED horizon 1, upgrading the layout
    assert similarity._list_versions(spark, p) == [1]
    assert similarity._sidecar_horizon(spark, p + "/v1") == 1


def test_vacuum_default_refuses_unreadable_sidecar(spark, tmp_path, emb_halves):
    """A default-horizon vacuum under crash debris must not guess a
    horizon and delete history: unreadable live sidecar -> IOError
    (run ivfpq_recover first), while an explicit horizon still works
    for operators who know what they're doing."""
    import shutil

    _, old, _ = emb_halves
    enc, cents, books = similarity.ivfpq_index(
        old, n_clusters=8, m=8, ks=256, seed=42
    )
    p = str(tmp_path / "ptr")
    similarity.ivfpq_write(
        enc, cents, books, p, swap_mode="pointer", retain_versions=2
    )
    similarity.ivfpq_compact(spark, p, emb_halves[0], seed=42)
    assert similarity._list_versions(spark, p) == [0, 1]
    shutil.rmtree(p + "/v1/meta")  # live sidecar gone: crash debris
    with pytest.raises(IOError, match="ivfpq_recover"):
        similarity.ivfpq_vacuum(spark, p)
    # explicit horizon bypasses the persisted-value resolution
    assert similarity.ivfpq_vacuum(spark, p, retain_versions=2) == 0


def test_vacuum_default_on_never_seeded_path_is_noop(spark, tmp_path):
    """r16 advice: a scheduled default vacuum pointed at a
    not-yet-seeded index (nonexistent path, or an empty dir with no
    pointer / version dirs / grace slot / layout) has nothing to
    reclaim and must return 0 — not die with an IOError whose own
    remediation (ivfpq_recover) would raise FileNotFoundError on the
    same empty path. The refusal is reserved for paths that DO hold
    index state under an unreadable live sidecar (previous test)."""
    missing = str(tmp_path / "never_seeded")
    assert similarity.ivfpq_vacuum(spark, missing) == 0
    # an existing-but-empty directory is equally stateless
    empty = tmp_path / "empty_dir"
    empty.mkdir()
    assert similarity.ivfpq_vacuum(spark, str(empty)) == 0
    # the recover remediation on the stateless path is indeed the
    # advertised FileNotFoundError — the vacuum no-op is what keeps a
    # nightly cron alive, recover stays the crash-debris tool
    with pytest.raises(FileNotFoundError):
        similarity.ivfpq_recover(spark, missing)
