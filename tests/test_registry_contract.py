"""Driver-contract meta-tests (no Spark session needed): the four plan
modules merge into one registry, so a name collision would SILENTLY
shadow a query; every oracle entry must have a query; and the
ever-red-first ordering decides which queries the (prefix-limited)
driver gate checks."""

import __spark_entry__ as entry
from near_event_streams_spark.plans import (
    analytics,
    analytics_ext,
    curation,
    llm_ops,
    timeseries,
)


def test_no_cross_module_name_collisions():
    # analytics.QUERIES already merges analytics_ext — compare the
    # leaf dicts pairwise instead
    base = {
        k: v
        for k, v in analytics.QUERIES.items()
        if k not in analytics_ext.QUERIES
    }
    mods = {
        "analytics": set(base),
        "analytics_ext": set(analytics_ext.QUERIES),
        "llm_ops": set(llm_ops.QUERIES),
        "curation": set(curation.QUERIES),
        "timeseries": set(timeseries.QUERIES),
    }
    names = sorted(mods)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            clash = mods[a] & mods[b]
            assert not clash, f"{a} and {b} both define {sorted(clash)}"


def test_every_oracle_has_a_query_and_registry_is_wellformed():
    qs, osql = entry.queries(), entry.oracle_sql()
    orphans = sorted(set(osql) - set(qs))
    assert not orphans, f"oracle_sql without queries(): {orphans}"
    assert len(qs) >= 160
    # every registered query is oracle-gated (the last rows-only entry,
    # text_bpe_merges, got its chained-CTE oracle in round 6)
    rows_only = sorted(set(qs) - set(osql))
    assert rows_only == [], rows_only


def test_ever_red_queries_order_first():
    """The external driver may gate only a prefix of the registry; a
    query that failed a driver round must re-verify before anything
    else — until it graduates (GRADUATION_GREENS later-round greens)."""
    qs = list(entry.queries())
    _, _, needs_recheck = entry._driver_history()
    if not needs_recheck:
        return
    k = len(needs_recheck)
    assert set(qs[:k]) == needs_recheck, (qs[:5], sorted(needs_recheck)[:5])


def test_long_green_ever_red_queries_graduate():
    """r10 verdict item 3: the 8 round-1..6 ever-red queries each have
    ≥4 driver-green checks in later rounds, far past the N=2
    graduation bar — none may still pin a priority slot, so the
    50-row driver window drains the stale cohorts instead."""
    _, _, needs_recheck = entry._driver_history()
    graduated = {
        "agg_approx_distinct",
        "agg_collect_sorted",
        "array_functions_2",
        "layout_zorder_locality",
        "q12_priority_lines",
        "rfm_customer_segments",
        "sessionize_events",
        "text_bpe_merges",
    }
    still_pinned = graduated & needs_recheck
    assert not still_pinned, still_pinned


def test_graduation_logic_on_synthetic_history(tmp_path, monkeypatch):
    """Unit-check the rule itself: red in r2 with greens in r3+r4
    graduates; red in r2 with a single green in r3 does not; a green
    in the SAME round as the red (driver retry artifacts) must not
    count toward graduation."""
    import json

    hist = {
        1: {"a": {"rows_match": True}, "b": {"rows_match": True}},
        2: {
            "a": {"rows_match": False},
            "b": {"err": "boom"},
            "c": {"rows_match": False},
        },
        3: {"a": {"rows_match": True}, "b": {"rows_match": True}},
        4: {"a": {"rows_match": True}},
    }
    for rnd, rows in hist.items():
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps(rows)
        )
    monkeypatch.setattr(
        entry.os.path, "dirname", lambda _p: str(tmp_path)
    )
    _, _, needs_recheck = entry._driver_history()
    assert "a" not in needs_recheck  # 2 greens after last bad
    assert "b" in needs_recheck  # only 1 green after last bad
    assert "c" in needs_recheck  # 0 greens after last bad


def test_rotation_prefers_stalest_cohort():
    """After the ever-red block, ordering is by last-checked round
    ascending: a 50-row driver prefix must drain the stalest cohort
    before re-checking anything fresher."""
    qs = list(entry.queries())
    _, last_round, ever_bad = entry._driver_history()
    rest = [q for q in qs if q not in ever_bad]
    rounds = [last_round.get(q, 0) for q in rest]
    assert rounds == sorted(rounds), "non-red queries not stalest-first"


# ---------------------------------------------------------------------------
# ROUND-on-double-quotient hygiene (the r6 rfm_customer_segments class)
# ---------------------------------------------------------------------------

# Queries with a KNOWN, reviewed ROUND(<expr with float division>, n)
# site in their oracle SQL, mapped to site count. Every entry is one of:
#   * invariant-gated — the compared columns are exact counts/booleans
#     computed engine-locally, so the ROUND never reaches the hash
#     (dedup_*_docs gates, ingest_neardup_incremental, quality/knn/ann
#     recall gates);
#   * sqrt/ln/exp-domain — the quotient involves an irrational factor,
#     so a 6dp half-tie is measure-zero (stats_corr_regression,
#     ts_lag_correlation precedent; docstrings carry the residual-risk
#     note);
#   * small-integer ratio, empirically driver-green across rounds and
#     structurally tie-poor (jaccard/containment pair lists, histogram
#     bucket edges, token ratios).
# A NEW query must NOT add a site: either round in the exact-integer /
# decimal domain (functions/rounding.half_up*; F.round(dec, n)) or
# consciously extend this map with a reviewed entry.
ACCEPTED_ROUND_ON_DOUBLE = {
    "ann_cosine_topk": 1,
    "ann_ivf_topk": 1,
    # same shared _ANN_INVARIANT_SQL site as ann_ivf/ann_lsh: the ROUND
    # sits inside the exact-topk CTE and the gate emits only a count +
    # boolean, so a half-tie cannot hash-diverge the compared output
    "ann_ivfpq_topk": 1,
    # r10: both reuse the same shared exact-topk CTE; ann_ivfpq_persisted
    # emits counts + two booleans, ann_opq_topk a count + boolean — no
    # rounded double ever reaches the compared output
    "ann_ivfpq_persisted": 1,
    "ann_ivfpq_append": 1,
    # r12: same shared exact-topk CTE; these gates emit counts +
    # booleans only, so the rounded double never reaches the compared
    # output
    "ann_ivfpq_compacted": 1,
    # r13: same shared exact-topk CTE again; both gates emit a count +
    # booleans — the rounded double never reaches the compared output
    "ann_ivfpq_stream_ingested": 1,
    "ann_index_build_reproducible": 1,
    # r14: pointer-swap gate reuses the shared exact-topk CTE; the
    # drift-trigger gate uses its drifted-corpus twin (same ROUND site,
    # shifted flat CTE) — both emit a count + booleans only, so the
    # rounded double never reaches the compared output
    "ann_ivfpq_pointer_swap": 1,
    "ann_compact_drift_trigger": 1,
    # r15: retention gate reuses the shared exact-topk CTE; emits a
    # count + booleans only, so the rounded double never reaches the
    # compared output
    "ann_index_version_retention": 1,
    # r16: persisted-horizon gate, same shared exact-topk CTE, same
    # count + booleans shape
    "ann_retention_horizon_persisted": 1,
    "ann_opq_persisted": 1,
    "ann_opq_topk": 1,
    "ann_lsh_topk": 1,
    # r13: the shared jaccard/containment CTEs moved to the
    # exact-integer HALF_UP expansion, clearing the whole
    # dedup_*/ingest_neardup_incremental family off this list
    "dedup_embedding_cosine": 2,
    "dedup_semantic_clusters": 1,
    # 12-dp rounding of a transcendental PSI term into the decimal
    # domain before the exact decimal total — the text_kl_source_drift
    # recipe; a 12-dp half-tie on a libm ln product is measure-zero
    "drift_psi_log": 1,
    "emb_dimension_profile": 1,
    "emb_quantize_int8": 1,
    "emb_source_similarity": 1,
    "feature_zscore_winsorize": 1,
    "hist_doc_tokens": 1,
    "hist_order_totals": 1,
    "knn_label_audit": 1,
    "knn_label_audit_ivf": 1,
    "mixture_temperature_sources": 3,
    "multimodal_decode_rasters": 1,
    "multimodal_frame_sample": 1,
    "multimodal_resize_rasters": 1,
    "quality_pr_curve": 4,
    "stats_corr_regression": 3,
    "string_fuzzy_levenshtein": 1,
    "text_kl_source_drift": 1,
    "text_pmi_collocations": 1,
    "text_quality_distill": 4,
    "text_quality_docs": 2,
    "text_quality_gopher": 3,
    "text_source_entropy": 2,
    "text_tfidf_topterms": 1,
    "ts_lag_correlation": 1,
}


def _round_arg1(sql: str, i: int) -> str:
    """First top-level argument of the call whose '(' is at sql[i]."""
    depth = 0
    j = i
    while j < len(sql):
        c = sql[j]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return sql[i + 1 : j]
        elif c == "," and depth == 1:
            return sql[i + 1 : j]
        j += 1
    return sql[i + 1 :]


def _round_on_double_sites(sql: str) -> list[str]:
    """ROUND( sites whose first argument contains a float division and
    — ``//`` (DuckDB integer floor division) excluded. There is NO
    decimal exemption: DuckDB promotes DECIMAL division to DOUBLE, so
    ``ROUND(decimal_expr / x, n)`` is exactly as risky as the raw
    double form; only division-free decimal rounding is safe (and that
    contains no '/', so it never reaches this check)."""
    out = []
    up = sql.upper()
    k = 0
    while True:
        k = up.find("ROUND(", k)
        if k < 0:
            break
        a = _round_arg1(sql, k + 5)
        if "/" in a.replace("//", " "):
            out.append(" ".join(a.split())[:60])
        k += 6
    return out


def test_no_unreviewed_round_on_double_quotient():
    """Mechanical guard for the r6 ``rfm_customer_segments`` failure
    class: Spark HALF_UPs the shortest-decimal RENDERING of a double
    while DuckDB rounds the BINARY value, so ``ROUND(double_quotient,
    n)`` can hash-diverge on an exact half-tie. Every such site in the
    oracle registry must be a consciously reviewed entry in
    ``ACCEPTED_ROUND_ON_DOUBLE`` — a new query that rounds a raw double
    quotient fails here and must either use the exact-integer helpers
    (``functions/rounding``) / decimal-domain rounding, or extend the
    allowlist with a reviewed justification."""
    found = {}
    for name, sql in entry.oracle_sql().items():
        sites = _round_on_double_sites(sql)
        if sites:
            found[name] = len(sites)
    unexpected = {
        n: c
        for n, c in found.items()
        if ACCEPTED_ROUND_ON_DOUBLE.get(n) != c
    }
    stale = {
        n: c
        for n, c in ACCEPTED_ROUND_ON_DOUBLE.items()
        if found.get(n) != c
    }
    assert not unexpected, (
        f"unreviewed ROUND-on-double sites: {unexpected}; "
        "use functions/rounding.half_up* or decimal-domain rounding, "
        "or review + extend ACCEPTED_ROUND_ON_DOUBLE"
    )
    assert not stale, f"allowlist entries no longer matching: {stale}"


def test_round_on_double_detector_catches_a_plant():
    """The detector itself must fire on the canonical bad pattern and
    stay quiet on the two sanctioned alternatives."""
    bad = "SELECT ROUND(CAST(s AS DOUBLE) / n, 6) AS avg FROM t"
    good_decimal = "SELECT CAST(ROUND(CAST(s AS DECIMAL(12,2)), 6) AS DOUBLE) FROM t"
    good_intdiv = "SELECT CAST((s*2000000 + n) // (2*n) AS BIGINT) FROM t"
    assert len(_round_on_double_sites(bad)) == 1
    assert _round_on_double_sites(good_decimal) == []
    assert _round_on_double_sites(good_intdiv) == []
