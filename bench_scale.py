"""Synthetic scale stress-bench: measures whether the heaviest headline
queries scale ~linearly when their inputs grow well past sf0.1, under
the same AQE session config production uses (``session.get_spark``).

Why this exists: every 100 TB claim in SCALE.md is a plan-shape
argument (exchange budgets, broadcast decisions, partition-before-
explode) proven at 17 MB — too small to trigger AQE skew splits,
spills, or broadcast-threshold flips. This harness converts those
arguments into measurements at ~20x that volume on the same box.

Data generation (``--gen``, DuckDB, one-off, written to
``.scale_data/`` which is gitignored):

* ``documents`` x32 — every token is namespaced per copy
  (``q<copy><token>``), so each copy is its own closed dedup universe:
  near-dup/decontamination work grows BY CONSTRUCTION linearly in the
  copy count (no cross-copy candidate explosion that would measure the
  data, not the engine). Doc ids remap to ``doc_id + copy * K``.
* ``orders``/``lineitem`` x10 — order keys remap per copy; customer/
  part/supplier foreign keys are kept, so dimension joins fan 10x the
  facts over the same dims (the realistic growth shape: facts grow,
  dims don't).
* ``events`` x10 — event ids remap, user ids kept (hot users get 10x
  hotter — the skew direction that stresses AQE).
* ``embeddings`` x32 — vec ids remap, vectors reused (k-means /
  similarity work scales with row count; the value distribution is
  irrelevant to the plan shape).
* dimension tables copied through unchanged.

Usage::

    python bench_scale.py --gen      # build .scale_data (~350 MB)
    python bench_scale.py            # run the stress suite, write BENCH_scale.md

Reported per query: sf0.1 median, scaled median, wall ratio, the
expected input multiplier, and the scaling verdict (ratio <= ~1.3x the
input multiplier = linear-or-better; queries with large fixed plan
overheads come in well under).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import time

SCALE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale_data")
SKEW_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale_skew")
BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DOC_COPIES = 32
FACT_COPIES = 10

# Skew variant (--gen-skew / --skew): volume growth is the same shape as
# the uniform stress, but the KEY DISTRIBUTION is adversarial —
# * events x10 with ~20% of ALL rows reassigned to ONE user (a Zipf-1
#   hot key): stresses the salted join's fan-out and AQE's skew-split
#   on anything that shuffles on user_id;
# * documents x16 with a shared 5-token sentence injected into HALF the
#   docs across every copy (one shingle in ~50% of the corpus): stresses
#   the PPJoin prefix filters — the df-descending canonical token order
#   must push the hot shingle out of every prefix, or candidate pairs
#   go quadratic.
SKEW_DOC_COPIES = 16
SKEW_FACT_COPIES = 10
SKEW_HOT_SHARE = 0.2  # fraction of event volume owned by the hot user

SKEW_STRESS = [
    ("join_salted_user_spend", SKEW_FACT_COPIES, "events x10, 20% one user"),
    ("diag_key_skew_users", SKEW_FACT_COPIES, "events x10, 20% one user"),
    ("sessionize_events", SKEW_FACT_COPIES, "events x10, 20% one user"),
    ("dedup_ngram_jaccard_docs", SKEW_DOC_COPIES, "docs x16, hot 5-gram in 50%"),
    ("dedup_containment_docs", SKEW_DOC_COPIES, "docs x16, hot 5-gram in 50%"),
    ("dedup_containment_lsh_docs", SKEW_DOC_COPIES, "docs x16, hot 5-gram in 50%"),
    ("ingest_neardup_select", SKEW_DOC_COPIES, "docs x16, hot 5-gram in 50%"),
]

# (query name, expected input multiplier, which tables drive it)
STRESS = [
    ("ingest_neardup_select", DOC_COPIES, "documents x32"),
    ("dedup_ngram_jaccard_docs", DOC_COPIES, "documents x32"),
    ("decontaminate_bloom_docs", DOC_COPIES, "documents x32"),
    ("q5_local_supplier", FACT_COPIES, "orders+lineitem x10"),
    ("q18_large_volume", FACT_COPIES, "orders+lineitem x10"),
    ("graph_pagerank_copurchase", FACT_COPIES, "lineitem x10"),
    ("dedup_containment_docs", DOC_COPIES, "documents x32"),
    ("dedup_containment_lsh_docs", DOC_COPIES, "documents x32"),
    ("emb_kmeans_lloyd", DOC_COPIES, "embeddings x32"),
    ("emb_power_iteration", DOC_COPIES, "embeddings x32"),
    ("graph_triangle_census", FACT_COPIES, "lineitem x10"),
]


def gen() -> None:
    import duckdb

    os.makedirs(SCALE_DIR, exist_ok=True)
    con = duckdb.connect()
    src = lambda t: f"read_parquet('{BASE_DIR}/{t}.parquet')"  # noqa: E731
    out = lambda t: os.path.join(SCALE_DIR, f"{t}.parquet")  # noqa: E731

    kdoc = con.sql(f"SELECT MAX(doc_id) + 1 FROM {src('documents')}").fetchone()[0]
    print(f"documents x{DOC_COPIES} (token-namespaced per copy)...")
    con.execute(
        f"""
        COPY (
          SELECT doc_id + c * {kdoc} AS doc_id,
                 regexp_replace(text, '([a-zA-Z0-9]+)', 'q' || c || '\\1', 'g')
                   AS text,
                 lang, source, n_chars
          FROM {src('documents')}, range({DOC_COPIES}) t(c)
        ) TO '{out('documents')}' (FORMAT PARQUET)
        """
    )

    kord = con.sql(f"SELECT MAX(o_orderkey) + 1 FROM {src('orders')}").fetchone()[0]
    print(f"orders/lineitem x{FACT_COPIES} (orderkey-remapped per copy)...")
    con.execute(
        f"""
        COPY (
          SELECT o_orderkey + c * {kord} AS o_orderkey, o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM {src('orders')}, range({FACT_COPIES}) t(c)
        ) TO '{out('orders')}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT l_orderkey + c * {kord} AS l_orderkey, l_partkey, l_suppkey,
                 l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                 l_returnflag, l_linestatus, l_shipdate
          FROM {src('lineitem')}, range({FACT_COPIES}) t(c)
        ) TO '{out('lineitem')}' (FORMAT PARQUET)
        """
    )

    kev = con.sql(f"SELECT MAX(event_id) + 1 FROM {src('events')}").fetchone()[0]
    print(f"events x{FACT_COPIES} (user ids kept: hot keys get hotter)...")
    con.execute(
        f"""
        COPY (
          SELECT event_id + c * {kev} AS event_id, ts, user_id, event_type,
                 value, props
          FROM {src('events')}, range({FACT_COPIES}) t(c)
        ) TO '{out('events')}' (FORMAT PARQUET)
        """
    )

    kemb = con.sql(f"SELECT MAX(vec_id) + 1 FROM {src('embeddings')}").fetchone()[0]
    print(f"embeddings x{DOC_COPIES} (vec ids remapped)...")
    con.execute(
        f"""
        COPY (
          SELECT vec_id + c * {kemb} AS vec_id, embedding, label
          FROM {src('embeddings')}, range({DOC_COPIES}) t(c)
        ) TO '{out('embeddings')}' (FORMAT PARQUET)
        """
    )

    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{BASE_DIR}/{t}.parquet", out(t))
    total = sum(
        os.path.getsize(os.path.join(SCALE_DIR, f)) for f in os.listdir(SCALE_DIR)
    )
    print(f"done: {total / 1e6:.0f} MB in {SCALE_DIR}")


def gen_skew() -> None:
    """Build .scale_skew: same volume-growth recipe as --gen, but with
    adversarial key distributions (see SKEW_* constants)."""
    import duckdb

    os.makedirs(SKEW_DIR, exist_ok=True)
    con = duckdb.connect()
    src = lambda t: f"read_parquet('{BASE_DIR}/{t}.parquet')"  # noqa: E731
    out = lambda t: os.path.join(SKEW_DIR, f"{t}.parquet")  # noqa: E731

    hot = con.sql(f"SELECT MIN(user_id) FROM {src('events')}").fetchone()[0]
    kev = con.sql(f"SELECT MAX(event_id) + 1 FROM {src('events')}").fetchone()[0]
    hot_copies = max(1, int(SKEW_FACT_COPIES * SKEW_HOT_SHARE))
    print(
        f"events x{SKEW_FACT_COPIES}, copies 0..{hot_copies - 1} "
        f"fully reassigned to hot user {hot!r} "
        f"(~{hot_copies / SKEW_FACT_COPIES:.0%} of all rows)..."
    )
    con.execute(
        f"""
        COPY (
          SELECT event_id + c * {kev} AS event_id, ts,
                 CASE WHEN c < {hot_copies} THEN {hot!r} ELSE user_id END
                   AS user_id,
                 event_type, value, props
          FROM {src('events')}, range({SKEW_FACT_COPIES}) t(c)
        ) TO '{out('events')}' (FORMAT PARQUET)
        """
    )

    kdoc = con.sql(f"SELECT MAX(doc_id) + 1 FROM {src('documents')}").fetchone()[0]
    print(
        f"documents x{SKEW_DOC_COPIES} (token-namespaced per copy, hot "
        f"5-gram appended to every even doc_id — ~50% of the corpus)..."
    )
    con.execute(
        f"""
        COPY (
          SELECT doc_id + c * {kdoc} AS doc_id,
                 regexp_replace(text, '([a-zA-Z0-9]+)', 'q' || c || '\\1', 'g')
                 || CASE WHEN doc_id % 2 = 0
                         THEN ' zhot0 zhot1 zhot2 zhot3 zhot4'
                         ELSE '' END AS text,
                 lang, source, n_chars
          FROM {src('documents')}, range({SKEW_DOC_COPIES}) t(c)
        ) TO '{out('documents')}' (FORMAT PARQUET)
        """
    )

    kemb = con.sql(f"SELECT MAX(vec_id) + 1 FROM {src('embeddings')}").fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT vec_id + c * {kemb} AS vec_id, embedding, label
          FROM {src('embeddings')}, range({SKEW_DOC_COPIES}) t(c)
        ) TO '{out('embeddings')}' (FORMAT PARQUET)
        """
    )

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        shutil.copyfile(f"{BASE_DIR}/{t}.parquet", out(t))
    total = sum(
        os.path.getsize(os.path.join(SKEW_DIR, f)) for f in os.listdir(SKEW_DIR)
    )
    print(f"done: {total / 1e6:.0f} MB in {SKEW_DIR}")


def _aqe_skew_evidence(spark, sf_dir: str) -> str:
    """Run the UNSALTED skew-shuffle shape (hot-keyed events sort-merge
    joined to a per-user dim) and report whether AQE's skew-split fired
    in the final adaptive plan — the 'observed where expected' evidence
    VERDICT r6 asked for, straight from the executed plan.

    The skew thresholds are temporarily lowered to match the local data
    volume (the defaults are 256 MB-per-partition, sized for real
    clusters; at 100 TB the hot partition passes them on its own —
    locally the whole table is ~50 MB, so without this the mechanism
    can never demonstrate itself).

    Two probe requirements learned the hard way: (a) the dim side must
    be a PLAIN shuffle under its Sort — OptimizeSkewedJoin's pattern is
    SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) and an aggregate
    between them makes it skip entirely, so the dim is localCheckpoint-
    materialized first; (b) the plan must be read from the SAME
    DataFrame that executed (``collect``, not ``count`` — count wraps a
    new plan instance and the inspected one stays isFinalPlan=false)."""
    from pyspark.sql import functions as F

    from near_event_streams_spark.sources.tables import load_table

    overrides = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        ev = load_table(spark, sf_dir, "events")
        dim = (
            ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("u_events"))
            .localCheckpoint()
        )
        joined = (
            ev.join(dim.hint("merge"), "user_id")
            .groupBy("event_type")
            .agg(F.sum("u_events").alias("s"))
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    fired = "skew=true" in plan or "skewed" in plan
    return (
        "AQE skew-split in unsalted hot-join final plan "
        "(thresholds scaled to local volume): "
        + ("OBSERVED" if fired else "not observed")
    )


def _percentile_approx_swapin(spark, sf_dir: str) -> str:
    """Exercise the documented percentile_approx swap-in for the
    exact-percentile class (MAD docstring, analytics_ext): same plan
    shape, mergeable sketch aggregation, on the skewed events. Reports
    wall time and max |approx - exact| over the per-type medians."""
    from pyspark.sql import functions as F

    from near_event_streams_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    t0 = time.time()
    exact = {
        r["event_type"]: r["med"]
        for r in ev.groupBy("event_type")
        .agg(F.percentile("value", F.lit(0.5)).alias("med"))
        .collect()
    }
    t_exact = time.time() - t0
    t0 = time.time()
    approx = {
        r["event_type"]: r["med"]
        for r in ev.groupBy("event_type")
        .agg(F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("med"))
        .collect()
    }
    t_approx = time.time() - t0
    err = max(abs(exact[k] - approx[k]) for k in exact)
    return (
        f"percentile_approx swap-in (grouped median, skewed events): "
        f"exact={t_exact:.2f}s approx={t_approx:.2f}s max_abs_err={err:.4g}"
    )


def run_skew() -> None:
    import bench
    from near_event_streams_spark.session import get_spark

    if not os.path.isdir(SKEW_DIR):
        raise SystemExit("no .scale_skew — run `python bench_scale.py --gen-skew`")
    spark = get_spark(app_name="bench_scale_skew")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    fns = dict(bench.HEADLINE)
    for name, fn in entry.queries().items():
        fns.setdefault(name, fn)
    rows = []
    for name, mult, driver in SKEW_STRESS:
        fn = fns[name]
        fn(spark, BASE_DIR).count()  # warm
        base = _median_time(fn, spark, BASE_DIR)
        fn(spark, SKEW_DIR).count()
        scaled = _median_time(fn, spark, SKEW_DIR)
        ratio = scaled / base
        verdict = "linear-or-better" if ratio <= 1.3 * mult else "SUPERLINEAR"
        rows.append((name, driver, mult, base, scaled, ratio, verdict))
        print(
            f"{name}: base={base:.2f}s skewed={scaled:.2f}s "
            f"ratio={ratio:.1f}x (input x{mult}) -> {verdict}"
        )
    notes = [
        _aqe_skew_evidence(spark, SKEW_DIR),
        _percentile_approx_swapin(spark, SKEW_DIR),
    ]
    for n in notes:
        print(n)
    report = {
        "metric": "scale_stress_skew",
        "base_dir": BASE_DIR,
        "doc_copies": SKEW_DOC_COPIES,
        "fact_copies": SKEW_FACT_COPIES,
        "hot_share": SKEW_HOT_SHARE,
        "notes": notes,
        "queries": {
            name: {
                "base_sec": round(b, 3),
                "skewed_sec": round(s, 3),
                "ratio": round(r, 2),
                "input_multiplier": m,
                "verdict": v,
            }
            for name, _, m, b, s, r, v in rows
        },
    }
    print(json.dumps(report))
    _append_skew_md(rows, notes)


def _append_skew_md(rows, notes) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_scale.md")
    with open(path) as f:
        content = f.read()
    marker = "## Appendix: skew-adversarial stress"
    content = content.split(marker)[0].rstrip() + "\n\n"
    lines = [
        marker,
        "",
        f"Same growth recipe, adversarial keys: events x{SKEW_FACT_COPIES} "
        f"with ~{SKEW_HOT_SHARE:.0%} of ALL rows on one user (Zipf-1 hot "
        f"key), documents x{SKEW_DOC_COPIES} with one 5-token sentence in "
        "~50% of docs (hot shingle). Median of 3 after a warm run.",
        "",
        "| query | inputs | input x | sf0.1 s | skewed s | wall ratio | verdict |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, driver, m, b, s, r, v in rows:
        lines.append(
            f"| {name} | {driver} | {m} | {b:.2f} | {s:.2f} | {r:.1f}x | {v} |"
        )
    lines += ["", *(f"- {n}" for n in notes), ""]
    with open(path, "w") as f:
        f.write(content + "\n".join(lines))
    print(f"appended skew section to {path}")


def _recall_corpus_distinct(emb, vec_col: str = "embedding") -> bool:
    """True when every vector in the corpus is distinct. ANN RECALL may
    only be measured on a distinct-vector corpus: the 32x `.scale_data`
    table duplicates every vector 32 times, so each query's true top-k
    are its own copies — co-located in one cell by construction —
    and recall reads 1.000 in every index state, proving nothing
    (r12 verdict #4: this was a comment in run_ivfpq_compact; it is
    now enforced at every recall measurement)."""
    from pyspark.sql import functions as F

    n = emb.count()
    nd = emb.select(
        F.col(vec_col).cast("array<float>").cast("string")
    ).distinct().count()
    return nd == n


def _require_distinct_recall_corpus(emb, label: str) -> None:
    """Hard gate for sections whose CLAIM is a recall number."""
    if not _recall_corpus_distinct(emb):
        raise SystemExit(
            f"{label}: recall corpus has duplicate vectors — a "
            "duplicated corpus cannot show recall erosion (every "
            "query's top-k are its own copies). Measure recall on the "
            "distinct base table; measure WALL on the duplicated one."
        )


def _median_time(fn, spark, sf_dir: str, runs: int = 3) -> float:
    times = []
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, sf_dir).count()
        times.append(time.time() - t0)
    return statistics.median(times)


def run() -> None:
    import bench
    from near_event_streams_spark.session import get_spark

    if not os.path.isdir(SCALE_DIR):
        raise SystemExit("no .scale_data — run `python bench_scale.py --gen` first")
    spark = get_spark(app_name="bench_scale")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    fns = dict(bench.HEADLINE)
    for name, fn in entry.queries().items():
        fns.setdefault(name, fn)
    rows = []
    for name, mult, driver in STRESS:
        fn = fns[name]
        fn(spark, BASE_DIR).count()  # warm (JVM, file index, codegen)
        base = _median_time(fn, spark, BASE_DIR)
        fn(spark, SCALE_DIR).count()
        scaled = _median_time(fn, spark, SCALE_DIR)
        ratio = scaled / base
        verdict = "linear-or-better" if ratio <= 1.3 * mult else "SUPERLINEAR"
        rows.append((name, driver, mult, base, scaled, ratio, verdict))
        print(
            f"{name}: base={base:.2f}s scaled={scaled:.2f}s "
            f"ratio={ratio:.1f}x (input x{mult}) -> {verdict}"
        )
    report = {
        "metric": "scale_stress",
        "base_dir": BASE_DIR,
        "doc_copies": DOC_COPIES,
        "fact_copies": FACT_COPIES,
        "queries": {
            name: {
                "base_sec": round(b, 3),
                "scaled_sec": round(s, 3),
                "ratio": round(r, 2),
                "input_multiplier": m,
                "verdict": v,
            }
            for name, _, m, b, s, r, v in rows
        },
    }
    print(json.dumps(report))
    _write_md(rows)


def _write_md(rows) -> None:
    lines = [
        "# BENCH_scale — synthetic scale stress (round 6)",
        "",
        f"Inputs: sf0.1 grown to documents x{DOC_COPIES} (token-namespaced "
        f"per copy — each copy a closed dedup universe), orders/lineitem/"
        f"events x{FACT_COPIES} (fact keys remapped, dimension/user keys "
        "kept). Session = production `get_spark` (AQE on, skew-join on, "
        "32 shuffle partitions, local[32]). Median of 3 after a warm run; "
        "cache cleared per run.",
        "",
        "| query | inputs | input x | sf0.1 s | scaled s | wall ratio | verdict |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, driver, m, b, s, r, v in rows:
        lines.append(
            f"| {name} | {driver} | {m} | {b:.2f} | {s:.2f} | {r:.1f}x | {v} |"
        )
    lines += [
        "",
        "Reading: wall ratio <= ~1.3x the input multiplier counts as "
        "linear-or-better (fixed plan-build/JVM overheads amortize, so "
        "most queries come in WELL under the multiplier). A SUPERLINEAR "
        "verdict means a plan shape broke at scale and needs a fix "
        "before the next round.",
        "",
    ]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_scale.md")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}")




NEARDUP_LAT_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".scale_neardup"
)


def run_neardup_latency() -> None:
    """Per-batch probe latency of the incremental near-dup ingest vs
    REGISTRY size — the empirical check of the bucket-pruned store's
    O(touched buckets) claim (``streaming/ingest.py``): a fixed 2,000-doc
    micro-batch is decided against registries grown from 5k to 40k docs
    (up to ~10x sf0.1, sourced from the token-namespaced .scale_data
    corpus so registry growth adds NO new true near-dups of the probe
    batch); if pruning works the decision wall stays ~flat while the
    registry grows 8x. Writes a section into BENCH_scale.md."""
    import shutil

    from pyspark.sql import functions as F

    from near_event_streams_spark.session import get_spark
    from near_event_streams_spark.streaming import ingest

    if not os.path.isdir(SCALE_DIR):
        raise SystemExit("no .scale_data — run `python bench_scale.py --gen` first")
    spark = get_spark(app_name="bench_neardup_latency")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SCALE_DIR, "documents.parquet"))
    # fixed probe batch: 2,000 docs from the LAST copy, re-id'd so they
    # never collide with registry ids
    probe = (
        docs.orderBy(F.col("doc_id").desc())
        .limit(2000)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        .persist()
    )
    probe.count()
    # 155k (31 copies) is the ceiling that keeps the no-true-dup
    # property: the probe batch is copy 31 (ids 158000..159999, its own
    # token namespace), so any registry cut below 155000 contains zero
    # true near-dups of the probe — growth measures pruning, not match
    # volume. 40k→80k→155k extends the r8 curve ~4× further (r9).
    sizes = [5_000, 10_000, 20_000, 40_000, 80_000, 155_000]
    rows = []
    for n in sizes:
        reg_path = os.path.join(NEARDUP_LAT_DIR, f"reg_{n}")
        shutil.rmtree(reg_path, ignore_errors=True)
        os.makedirs(reg_path, exist_ok=True)
        reg_docs = docs.filter(F.col("doc_id") < n)
        accepted = ingest.neardup_batch_against_registry(
            reg_docs, reg_path, cache=[]
        )
        ingest.register_batch_neardup(
            accepted, reg_path, batch_id=0, n_buckets=64
        )
        _state = ingest.upsert.read_state(spark, reg_path)
        reg_rows = _state.count() if _state is not None else 0
        times = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            ingest.neardup_batch_against_registry(
                probe, reg_path, cache=[]
            ).count()
            times.append(time.time() - t0)
        lat = statistics.median(times)
        rows.append((n, reg_rows, lat))
        print(f"registry={n} docs ({reg_rows} state rows): "
              f"probe batch latency {lat:.2f}s (median of 3)")
    report = {
        "metric": "neardup_probe_latency_vs_registry",
        "probe_batch_docs": 2000,
        "points": [
            {"registry_docs": n, "state_rows": r, "batch_sec": round(t, 3)}
            for n, r, t in rows
        ],
    }
    print(json.dumps(report))
    flat = rows[-1][2] <= rows[0][2] * 2.0
    lines = [
        "",
        "## Incremental near-dup probe: batch latency vs registry size",
        "",
        "Fixed 2,000-doc probe batch decided against growing registries",
        "(`streaming/ingest.neardup_batch_against_registry`, bucket-pruned",
        "merge-upsert store, 64 buckets). O(touched buckets) claim holds if",
        "latency stays ~flat while the registry grows 31x (5k -> 155k docs;",
        "155k = 31 token-namespaced copies, the ceiling that keeps the",
        "probe batch free of true registry near-dups).",
        "",
        "| registry docs | state rows | probe batch sec |",
        "|---|---|---|",
    ]
    for n, r, t in rows:
        lines.append(f"| {n} | {r} | {t:.2f} |")
    lines.append("")
    lines.append(
        f"Verdict: {'FLAT (<=2x across 31x registry growth)' if flat else 'NOT FLAT - investigate'}"
    )
    lines.append("")
    _append_named_section(lines, "## Incremental near-dup probe")


def run_ivfpq() -> None:
    """IVF-Flat vs IVF-PQ at 32x embeddings (64k vectors): measures the
    candidate-scan BYTE reduction that is IVF-PQ's entire reason to
    exist (at 100 TB the binding constraint is memory/scan bytes, not
    single-box wall), plus wall time and recall@5 vs brute force under
    IDENTICAL coarse routing (same n_clusters/nprobe/seed, so the two
    paths score the exact same candidate set). Byte accounting, from
    the physical layout: a float32 dim-64 vector is 256 B; its PQ row
    is m=8 code bytes + one float64 norm = 16 B (16x). IVF-Flat reads
    full vectors for EVERY candidate; IVF-PQ reads 16 B per candidate
    plus full vectors for only the refine*k shortlist per query.
    Writes a section into BENCH_scale.md."""
    from pyspark.sql import functions as F

    from near_event_streams_spark.operators import similarity
    from near_event_streams_spark.session import get_spark

    if not os.path.isdir(SCALE_DIR):
        raise SystemExit("no .scale_data — run `python bench_scale.py --gen` first")
    spark = get_spark(app_name="bench_ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(
        os.path.join(SCALE_DIR, "embeddings.parquet")
    ).persist()
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < 100).persist()
    nq = queries.count()
    K, NC, NPROBE, M, REFINE = 5, 16, 4, 8, 4
    dim = len(emb.select("embedding").first()[0])
    full_row_b = dim * 4  # float32 storage width
    pq_row_b = M + 8  # m uint8 codes + float64 stored norm

    # candidate volume under this routing: sum of probed-cluster sizes
    # (identical for both paths — same index seed, same probe list)
    assigned, centroids = similarity.ivf_index(emb, NC)
    probes = similarity._nearest_centroids(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ),
        centroids,
        NPROBE,
        "query",
    )
    csizes = assigned.groupBy("cluster").count()
    n_cand = (
        probes.join(csizes, "cluster")
        .agg(F.sum("count").alias("n"))
        .first()["n"]
    )
    flat_bytes = n_cand * full_row_b
    pq_bytes = n_cand * pq_row_b + nq * REFINE * K * full_row_b
    reduction = flat_bytes / pq_bytes

    def flat_fn(s, d):
        return similarity.ivf_topk(queries, emb, k=K, n_clusters=NC, nprobe=NPROBE)

    def pq_fn(s, d):
        return similarity.ivfpq_topk(
            queries, emb, k=K, n_clusters=NC, nprobe=NPROBE,
            m=M, ks=256, refine=REFINE,
        )

    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.brute_force_topk(queries, emb, k=K).collect()
    }
    # this section's CLAIM is the byte reduction; the recall column is
    # side evidence — but it is measured on the 32x DUPLICATED corpus,
    # where recall cannot erode (every query's top-k are its own
    # copies). Flag that loudly in the output and the report rather
    # than let a future reader cite the column as a recall result
    # (r12 verdict #4).
    recall_corpus_ok = _recall_corpus_distinct(emb)
    if not recall_corpus_ok:
        print(
            "WARNING run_ivfpq: recall measured on a DUPLICATED corpus "
            "(32x .scale_data) — it is an equal-routing sanity check, "
            "NOT a recall-erosion measurement; see run_ivfpq_compact "
            "for recall on distinct vectors"
        )
    walls, recalls = {}, {}
    for name, fn in (("ivf_flat", flat_fn), ("ivf_pq", pq_fn)):
        got = {(r["query_id"], r["cand_id"]) for r in fn(spark, None).collect()}
        recalls[name] = len(got & exact) / len(exact)
        fn(spark, None).count()  # warm
        walls[name] = _median_time(fn, spark, None)
        print(
            f"{name}: wall={walls[name]:.2f}s recall@{K}={recalls[name]:.3f}"
        )
    report = {
        "metric": "ivfpq_candidate_scan_bytes",
        "corpus_vectors": n_corpus,
        "recall_corpus_distinct": recall_corpus_ok,
        "queries": nq,
        "candidate_rows": int(n_cand),
        "flat_scan_mb": round(flat_bytes / 1e6, 2),
        "pq_scan_mb": round(pq_bytes / 1e6, 2),
        "byte_reduction": round(reduction, 1),
        "walls_sec": {k: round(v, 3) for k, v in walls.items()},
        "recall_at_5": {k: round(v, 3) for k, v in recalls.items()},
    }
    print(json.dumps(report))
    lines = [
        "",
        "## IVF-PQ vs IVF-Flat: candidate-scan bytes (32x embeddings)",
        "",
        f"{n_corpus} corpus vectors (dim {dim} float32), {nq} queries, "
        f"identical coarse routing (n_clusters={NC}, nprobe={NPROBE}) -> "
        f"{n_cand} candidate rows for BOTH paths. IVF-Flat scans the full "
        f"{full_row_b} B vector per candidate; IVF-PQ scans {pq_row_b} B "
        f"(m={M} codes + stored norm) per candidate and fetches full "
        f"vectors only for the refine*k={REFINE * K} shortlist per query.",
        "",
        "| path | candidate-scan bytes | wall s (median of 3) | recall@5 vs brute |",
        "|---|---|---|---|",
        f"| IVF-Flat | {flat_bytes / 1e6:.1f} MB | {walls['ivf_flat']:.2f} | {recalls['ivf_flat']:.3f} |",
        f"| IVF-PQ | {pq_bytes / 1e6:.1f} MB | {walls['ivf_pq']:.2f} | {recalls['ivf_pq']:.3f} |",
        "",
        f"Candidate-scan byte reduction: **{reduction:.1f}x** at dim {dim} "
        "(grows with dim: production 768-3072-dim float32 corpora see "
        "190-760x at m=16). Single-box wall is dominated by fixed plan "
        "overheads at 64k vectors; the byte column is the 100 TB story — "
        "it is the per-candidate I/O + memory footprint that decides "
        "whether a shard's index fits in executor memory.",
        "",
    ]
    _append_named_section(
        lines,
        "## IVF-PQ vs IVF-Flat",
        next_markers=[
            "## IVF-PQ persisted index",
            "## IVF-PQ compaction",
            "## Image near-dedup",
            "## Incremental near-dup probe",
            "## Appendix: skew-adversarial stress",
        ],
    )


def run_ivfpq_persist() -> None:
    """Amortization measurement for the persisted IVF-PQ index at 32x
    embeddings (64k vectors): a production corpus builds its index ONCE
    and probes it for months, so the number that matters is probe-only
    latency over ``ivfpq_read`` vs the build+probe wall ``ivfpq_topk``
    pays when handed a raw corpus. Writes a section into
    BENCH_scale.md."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from near_event_streams_spark.operators import similarity
    from near_event_streams_spark.session import get_spark

    if not os.path.isdir(SCALE_DIR):
        raise SystemExit("no .scale_data — run `python bench_scale.py --gen` first")
    spark = get_spark(app_name="bench_ivfpq_persist")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(
        os.path.join(SCALE_DIR, "embeddings.parquet")
    ).persist()
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < 100).persist()
    nq = queries.count()
    K, NC, NPROBE, M, REFINE = 5, 16, 4, 8, 4

    def build_probe(s, d):
        return similarity.ivfpq_topk(
            queries, emb, k=K, n_clusters=NC, nprobe=NPROBE,
            m=M, ks=256, refine=REFINE,
        )

    build_probe(spark, None).count()  # warm JIT once
    wall_build_probe = _median_time(build_probe, spark, None)

    path = tempfile.mkdtemp(prefix="nes_scale_pqidx_")
    try:
        t0 = time.perf_counter()
        enc, cents, books = similarity.ivfpq_index(
            emb, NC, M, 256, id_col="vec_id", vec_col="embedding"
        )
        similarity.ivfpq_write(enc, cents, books, path)
        wall_build_write = time.perf_counter() - t0

        idx = similarity.ivfpq_read(spark, path)

        def probe_only(s, d):
            return similarity.ivfpq_topk(
                queries, emb, k=K, nprobe=NPROBE, refine=REFINE, index=idx
            )

        n_pers = probe_only(spark, None).count()  # warm
        wall_probe = _median_time(probe_only, spark, None)

        fresh = {
            tuple(r) for r in build_probe(spark, None).collect()
        }
        pers = {tuple(r) for r in probe_only(spark, None).collect()}
        identical = fresh == pers
    finally:
        shutil.rmtree(path, ignore_errors=True)

    report = {
        "metric": "ivfpq_persisted_probe_sec",
        "corpus_vectors": n_corpus,
        "queries": nq,
        "build_probe_sec": round(wall_build_probe, 3),
        "build_write_once_sec": round(wall_build_write, 3),
        "probe_only_sec": round(wall_probe, 3),
        "probe_speedup": round(wall_build_probe / wall_probe, 1),
        "result_rows": n_pers,
        "persisted_equals_fresh": identical,
    }
    print(json.dumps(report))
    lines = [
        "",
        "## IVF-PQ persisted index: probe-only vs build+probe (32x embeddings)",
        "",
        f"{n_corpus} corpus vectors, {nq} queries, n_clusters={NC}, "
        f"nprobe={NPROBE}, m={M}, refine={REFINE}. The persisted layout "
        "(ivfpq_write) stores PQ rows hive-partitioned by coarse cluster "
        "+ a KB-sized centroids/codebooks sidecar; ivfpq_read hands the "
        "triple to ivfpq_topk(index=...) for a probe that never rebuilds.",
        "",
        "| path | wall s (median of 3) |",
        "|---|---|",
        f"| build + probe (per-call index, the pre-r10 only path) | {wall_build_probe:.2f} |",
        f"| build + write, paid ONCE | {wall_build_write:.2f} |",
        f"| probe-only over persisted index | {wall_probe:.2f} |",
        "",
        f"Probe-only is **{wall_build_probe / wall_probe:.1f}x** faster than "
        f"build+probe, and persisted results are "
        f"{'identical to' if identical else 'DIFFERENT FROM'} the fresh "
        "build (deterministic seeded training). At 100 TB the gap is the "
        "whole story: the build touches every corpus vector (encode pass) "
        "while a probe touches nprobe/n_clusters of the PQ rows "
        "(partition-pruned) plus refine*k full vectors per query.",
        "",
    ]
    # "## IVF-PQ compaction" FIRST: that section sits directly below
    # this one, and a marker list that skips it deletes it wholesale
    # on every rewrite (r13: the --ivfpq-persist refresh silently
    # swallowed the freshly-measured compaction tables)
    _append_named_section(
        lines,
        "## IVF-PQ persisted index",
        next_markers=[
            "## IVF-PQ compaction",
            "## Image near-dedup",
            "## Incremental near-dup probe",
            "## Appendix: skew-adversarial stress",
        ],
    )


def run_containment_cap() -> None:
    """Hot-shingle headroom for the exact containment PPJoin (r11 Next
    #7): on the skew corpus (docs x16, one 5-token sentence in ~50% of
    docs) `dedup_containment_docs` is the suite's steepest curve (7.4x
    wall at 16x input). `containment_pairs(max_df=)` drops over-ceiling
    shingles from candidate generation — probe prefixes AND the
    full-set inverted index whose hot rows dominate the skew cost —
    while verification still runs on full sets (precision exact).
    Measures wall + pairs with the knob off and at the LSH variant's
    default ceiling (max(100, 0.05*n_docs)), reporting the recall
    trade-off alongside the speedup. Writes a section into
    BENCH_scale.md."""
    from near_event_streams_spark.operators import dedup
    from near_event_streams_spark.session import get_spark

    if not os.path.isdir(SKEW_DIR):
        raise SystemExit("no .scale_skew — run `python bench_scale.py --gen-skew` first")
    spark = get_spark(app_name="bench_containment_cap")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(
        os.path.join(SKEW_DIR, "documents.parquet")
    ).persist()
    n_docs = docs.count()
    # two principled ceilings (r14 verdict #4): the LSH variant's
    # default probe-pool cap (5% of docs) and the
    # drop-only-true-monoculture cap (50% of docs — exactly the
    # planted hot shingle and nothing else on this fixture)
    cap_lsh = max(100, int(0.05 * n_docs))
    cap_half = int(0.5 * n_docs)

    def run_one(max_df):
        def fn(s, d):
            return dedup.containment_pairs(
                docs, threshold=0.9, min_shingles=5, max_df=max_df
            )

        pairs = {
            (r["a_doc_id"], r["b_doc_id"])
            for r in fn(spark, None).collect()  # warm + exact pair set
        }
        spark.catalog.clearCache()
        wall = _median_time(fn, spark, None)
        spark.catalog.clearCache()
        return pairs, wall

    pairs_exact, wall_exact = run_one(None)
    sweep = []
    for cap in (cap_half, cap_lsh):
        pairs_cap, wall_cap = run_one(cap)
        sweep.append(
            {
                "max_df": cap,
                "pairs": len(pairs_cap),
                "lost": len(pairs_exact - pairs_cap),
                "extra": len(pairs_cap - pairs_exact),
                "wall_sec": round(wall_cap, 2),
                "speedup": (
                    round(wall_exact / wall_cap, 2) if wall_cap else None
                ),
            }
        )

    report = {
        "metric": "containment_max_df_skew",
        "n_docs": n_docs,
        "pairs_exact": len(pairs_exact),
        "wall_exact_sec": round(wall_exact, 2),
        "sweep": sweep,
    }
    print(json.dumps(report))
    lines = [
        "",
        "## Containment dedup: hot-shingle ceiling on the skew corpus",
        "",
        f"Skew corpus ({n_docs} docs, one 5-token sentence in ~50% — the",
        "appendix's steepest curve at 7.4x wall / 16x input). Two",
        f"principled ceilings: df > 50% of docs ({cap_half} — drops",
        "EXACTLY the planted hot shingle, nothing else) and the LSH",
        f"variant's probe-pool default max(100, 0.05*n) = {cap_lsh}.",
        "Candidate generation drops over-ceiling shingles, verification",
        "stays on full sets (precision exact by construction):",
        "",
        "| config | verified pairs | lost | wall s (median of 3) | speedup |",
        "|---|---|---|---|---|",
        f"| exact (max_df=None) | {len(pairs_exact)} | — | {wall_exact:.2f} | 1.00x |",
    ]
    for row in sweep:
        lines.append(
            f"| max_df={row['max_df']} | {row['pairs']} | {row['lost']} "
            f"| {row['wall_sec']:.2f} | {row['speedup']}x |"
        )
    lines += [
        "",
        "Extra pairs must be 0 at every cap (verification is exact): "
        + (
            "confirmed."
            if all(r["extra"] == 0 for r in sweep)
            else "VIOLATED — investigate."
        ),
        "",
        f"Measured verdict: recall is EXACT at both ceilings; the wall",
        f"delta ({min(r['speedup'] for r in sweep)}-"
        f"{max(r['speedup'] for r in sweep)}x this run, 0.97x when r13",
        "measured the 5% cap on the same fixture) sits inside this",
        "box's run-to-run swing for the family — not a stable win. The",
        "df-ASCENDING prefix order already pushes the hot shingle out",
        "of every probe prefix, so its index rows never meet a probe",
        "row and the 7.4x appendix ratio is plain 16x data volume",
        "through shingling + dfreq + the rank window, not a hot-key",
        "join blow-up. AUTO-ARM REJECTED on these numbers: arming a",
        "cap when a df profile crosses a threshold would spend an",
        "extra dfreq pass to buy a wall delta indistinguishable from",
        "noise on the very distribution it targets. The cap stays",
        "(default OFF) for true monoculture corpora where boilerplate",
        "floods the prefixes themselves (the knob test plants that",
        "case: a doc made ENTIRELY of the hot sentence); loss is then",
        "confined to pairs whose contained side has no sub-ceiling",
        "probe-prefix witness.",
        "",
    ]
    _append_named_section(
        lines, "## Containment dedup: hot-shingle ceiling"
    )
    spark.stop()


def run_ivfpq_compact() -> None:
    """The r10 done-criterion measurement for `ivfpq_compact` (r11 Next
    #1c): at 32x embeddings, build a persisted index on HALF the
    corpus, append the other half (encoded against centroids trained
    before it existed — ~50% appended fraction), and measure probe
    recall@5 vs the exact brute-force baseline in three states: fresh
    full build, post-append, post-compact — all at the IDENTICAL
    standard probe settings (nprobe=12, refine=4). The claim under
    test: appends erode recall to ~0.88-0.90 and compaction restores
    the fresh-build 0.94-1.0. Also measures the compact wall and the
    skip-path wall (`min_appended_frac` not reached — what a scheduler
    pays calling compact unconditionally). Writes a section into
    BENCH_scale.md."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from near_event_streams_spark.operators import similarity
    from near_event_streams_spark.session import get_spark

    if not os.path.isdir(SCALE_DIR):
        raise SystemExit("no .scale_data — run `python bench_scale.py --gen` first")
    spark = get_spark(app_name="bench_ivfpq_compact")
    spark.sparkContext.setLogLevel("ERROR")
    K, NC, NPROBE, M, REFINE = 5, 16, 8, 8, 4

    # --- recall story: the DISTINCT sf0.1 vectors -------------------
    # The 32x scale corpus duplicates every vector 32 times, so a
    # query's true top-k are its own copies, co-located in one cluster
    # by construction — appends cannot erode recall there (measured
    # 1.000 in all three states). Routing quality only matters on
    # distinct vectors, so recall is measured on the base table and
    # the WALL costs on the 32x corpus below.
    emb = spark.read.parquet(
        os.path.join(BASE_DIR, "embeddings.parquet")
    ).persist()
    n_base = emb.count()
    # hard gate (r12 verdict #4): the recall claim below is only
    # meaningful on distinct vectors — refuse a duplicated corpus
    _require_distinct_recall_corpus(emb, "run_ivfpq_compact")
    queries = emb.filter(F.col("vec_id") < 100).persist()
    nq = queries.count()
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.brute_force_topk(queries, emb, k=K).collect()
    }

    def recall(index):
        approx = {
            (r["query_id"], r["cand_id"])
            for r in similarity.ivfpq_topk(
                queries, emb, k=K, nprobe=NPROBE, refine=REFINE, index=index
            ).collect()
        }
        return len(exact & approx) / len(exact)

    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    path = tempfile.mkdtemp(prefix="nes_scale_pqcompact_")
    try:
        # fresh full build — the recall ceiling compaction must restore
        enc_f, c_f, b_f = similarity.ivfpq_index(
            emb, NC, M, 256, id_col="vec_id", vec_col="embedding"
        )
        similarity.ivfpq_write(enc_f, c_f, b_f, path + "_fresh")
        r_fresh = recall(similarity.ivfpq_read(spark, path + "_fresh"))

        # half-build + append — the eroded state
        enc_o, c_o, b_o = similarity.ivfpq_index(
            old, NC, M, 256, id_col="vec_id", vec_col="embedding"
        )
        similarity.ivfpq_write(enc_o, c_o, b_o, path)
        similarity.ivfpq_append(spark, path, new)
        r_appended = recall(similarity.ivfpq_read(spark, path))

        # scheduled compact: skip path first (threshold above the real
        # appended fraction), then the firing path
        skip = similarity.ivfpq_compact(
            spark, path, emb, min_appended_frac=0.75
        )
        fired = similarity.ivfpq_compact(
            spark, path, emb, min_appended_frac=0.25
        )
        r_compacted = recall(similarity.ivfpq_read(spark, path))
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path + "_fresh", ignore_errors=True)
    queries.unpersist()

    # --- drift story: appends from a SHIFTED distribution -----------
    # The iid states above are expected NOT to erode under the r13
    # uniform-hash training sample: centroids fit on half a drift-free
    # corpus are statistically equivalent to a full-corpus fit, so
    # same-distribution appends route as well as base rows. Erosion is
    # a DRIFT phenomenon — vectors from a distribution the standing
    # geometry never saw quantize with large residuals against the old
    # centroids and mis-rank in the ADC scan. Emulate it
    # deterministically: the appended half is shifted +2 sigma on 8 of
    # the 64 dims (sigma ~0.125 per coordinate on this table).
    drifted = new.withColumn(
        "embedding",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: F.when(i < F.lit(8), x + F.lit(0.25)).otherwise(x),
        ),
    )
    emb_d = (
        old.withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )
        .unionByName(drifted)
        .persist()
    )
    queries_d = emb_d.filter(F.col("vec_id") < 200).persist()
    nq_d = queries_d.count()
    exact_d = {
        (r["query_id"], r["cand_id"])
        for r in similarity.brute_force_topk(
            queries_d, emb_d, k=K
        ).collect()
    }

    def recall_d(index):
        approx = {
            (r["query_id"], r["cand_id"])
            for r in similarity.ivfpq_topk(
                queries_d,
                emb_d,
                k=K,
                nprobe=NPROBE,
                refine=REFINE,
                index=index,
            ).collect()
        }
        return len(exact_d & approx) / len(exact_d)

    path_d = tempfile.mkdtemp(prefix="nes_scale_pqdrift_")
    try:
        # ceiling: fresh build over the drifted corpus (geometry SAW
        # the drifted cohort)
        enc_fd, c_fd, b_fd = similarity.ivfpq_index(
            emb_d, NC, M, 256, id_col="vec_id", vec_col="embedding"
        )
        similarity.ivfpq_write(enc_fd, c_fd, b_fd, path_d + "_fresh")
        r_fresh_d = recall_d(
            similarity.ivfpq_read(spark, path_d + "_fresh")
        )

        # eroded state: geometry trained pre-drift, drifted rows
        # appended against it (the daily-ingest-under-drift state)
        enc_od, c_od, b_od = similarity.ivfpq_index(
            old, NC, M, 256, id_col="vec_id", vec_col="embedding"
        )
        similarity.ivfpq_write(enc_od, c_od, b_od, path_d)
        similarity.ivfpq_append(spark, path_d, drifted)
        r_appended_d = recall_d(similarity.ivfpq_read(spark, path_d))

        # the scheduled compact retrains on a uniform hash sample of
        # the full lake — drifted rows enter the sample proportionally
        similarity.ivfpq_compact(
            spark, path_d, emb_d, min_appended_frac=0.25
        )
        r_compacted_d = recall_d(similarity.ivfpq_read(spark, path_d))
    finally:
        shutil.rmtree(path_d, ignore_errors=True)
        shutil.rmtree(path_d + "_fresh", ignore_errors=True)
    emb_d.unpersist()
    queries_d.unpersist()
    emb.unpersist()

    # --- wall story: the 32x corpus (64k vectors) -------------------
    emb32 = spark.read.parquet(
        os.path.join(SCALE_DIR, "embeddings.parquet")
    ).persist()
    n_corpus = emb32.count()
    old32 = emb32.filter(F.col("vec_id") % 2 == 0)
    new32 = emb32.filter(F.col("vec_id") % 2 == 1)
    path32 = tempfile.mkdtemp(prefix="nes_scale_pqcompact32_")
    try:
        enc32, c32, b32 = similarity.ivfpq_index(
            old32, NC, M, 256, id_col="vec_id", vec_col="embedding"
        )
        similarity.ivfpq_write(enc32, c32, b32, path32)
        similarity.ivfpq_append(spark, path32, new32)
        t0 = time.perf_counter()
        skip32 = similarity.ivfpq_compact(
            spark, path32, emb32, min_appended_frac=0.75
        )
        wall_skip = time.perf_counter() - t0
        t0 = time.perf_counter()
        similarity.ivfpq_compact(
            spark, path32, emb32, min_appended_frac=0.25
        )
        wall_compact = time.perf_counter() - t0
    finally:
        shutil.rmtree(path32, ignore_errors=True)
    emb32.unpersist()

    report = {
        "metric": "ivfpq_compact_recall_restore",
        "recall_vectors": n_base,
        "wall_vectors": n_corpus,
        "queries": nq,
        "appended_frac": round(fired["appended_frac"], 3),
        "recall_fresh": round(r_fresh, 3),
        "recall_appended": round(r_appended, 3),
        "recall_compacted": round(r_compacted, 3),
        "drift_queries": nq_d,
        "recall_fresh_drift": round(r_fresh_d, 3),
        "recall_appended_drift": round(r_appended_d, 3),
        "recall_compacted_drift": round(r_compacted_d, 3),
        "compact_wall_sec_32x": round(wall_compact, 2),
        "skip_wall_sec_32x": round(wall_skip, 2),
        "skip_fired": skip["compacted"] or skip32["compacted"],
    }
    print(json.dumps(report))
    lines = [
        "",
        "## IVF-PQ compaction: append recall under iid vs drifted ingest",
        "",
        f"Recall measured on the {n_base} DISTINCT sf0.1 vectors "
        f"(n_clusters={NC}, nprobe={NPROBE}, m={M}, refine={REFINE} — "
        "identical probe settings in every state); the 32x corpus "
        "cannot show erosion because every query's true top-k are its "
        "own 32 copies, co-located by construction.",
        "",
        "**Same-distribution appends do not erode — and that is the "
        "correct result, not a fixture gap**: under the uniform "
        "seeded-hash training sample (r13), centroids fit on half a "
        "drift-free corpus are statistically equivalent to a "
        "full-corpus fit, so appended iid vectors route as well as "
        f"base rows ({nq} queries):",
        "",
        "| index state (iid appends) | recall@5 vs exact |",
        "|---|---|",
        f"| fresh full build | {r_fresh:.3f} |",
        f"| half build + 50% appended (same distribution) | "
        f"{r_appended:.3f} |",
        f"| after scheduled compact (`min_appended_frac=0.25`, fired at "
        f"{fired['appended_frac']:.2f}) | {r_compacted:.3f} |",
        "",
        "**Drift is what erodes** — the appended half shifted +2σ on 8 "
        "of 64 dims (deterministic) quantizes with large residuals "
        "against the pre-drift geometry and mis-ranks in the ADC scan; "
        "the scheduled compact's uniform retrain sample sees the "
        "drifted cohort and restores the ceiling "
        f"({nq_d} mixed-cohort queries):",
        "",
        "| index state (drifted appends) | recall@5 vs exact |",
        "|---|---|",
        f"| fresh full build over drifted corpus (ceiling) | "
        f"{r_fresh_d:.3f} |",
        f"| pre-drift build + 50% drifted appends | {r_appended_d:.3f} |",
        f"| after scheduled compact | {r_compacted_d:.3f} |",
        "",
        f"Wall costs at the 32x corpus ({n_corpus} vectors): compact "
        f"rebuild {wall_compact:.1f} s; scheduler no-op "
        f"(`min_appended_frac=0.75`, not reached) {wall_skip:.2f} s — "
        "one sidecar read + one codes count, cheap enough to call "
        "unconditionally after every ingest window.",
        "",
        "Compaction restores the fresh-build recall exactly (same "
        "seeded training contract). At 100 TB the rebuild is the "
        "nightly maintenance job; the swap keeps probes consistent "
        "throughout (codes and sidecar move together, never in-place). "
        "At this fixture size every training sample sees the whole "
        "corpus; past the 32k/4k sample bounds the drift story is also "
        "why the samples rank by value hash — a vec_id-prefix sample "
        "would pin every retrain to the oldest (pre-drift) rows and "
        "stay blind to the appended cohort forever.",
        "",
    ]
    _append_named_section(
        lines,
        "## IVF-PQ compaction",
        next_markers=[
            "## Image near-dedup",
            "## Incremental near-dup probe",
            "## Appendix: skew-adversarial stress",
        ],
    )
    spark.stop()


def run_ann_ingest() -> None:
    """The idempotence tax of the streaming index append (r13): the
    `foreachBatch` sink appends with ``if_absent=True`` so an
    at-least-once batch redelivery cannot double-insert candidates —
    the cost is one anti-join against ONLY the cluster partitions the
    batch touches. Measure, at the 32x corpus (62k-row index, 2k-row
    batch): plain append vs first-delivery if_absent append vs the
    REDELIVERY (all ids already present — the path a crash replay
    pays), plus the healthy-layout `ivfpq_recover` fast path the sink
    runs at the top of every batch. Writes a section into
    BENCH_scale.md."""
    import tempfile

    from pyspark.sql import functions as F

    from near_event_streams_spark.operators import similarity
    from near_event_streams_spark.session import get_spark

    if not os.path.isdir(SCALE_DIR):
        raise SystemExit("no .scale_data — run `python bench_scale.py --gen` first")
    spark = get_spark(app_name="bench_ann_ingest")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(
        os.path.join(SCALE_DIR, "embeddings.parquet")
    ).persist()
    ids = emb.select(F.min("vec_id"), F.max("vec_id")).first()
    cut = int(ids[0]) + 2000
    base = emb.filter(F.col("vec_id") >= cut)
    batch = emb.filter(F.col("vec_id") < cut)
    n_base, n_batch = base.count(), batch.count()

    enc, cents, books = similarity.ivfpq_index(
        base, n_clusters=16, m=8, ks=256, seed=42
    )
    paths = {
        k: tempfile.mkdtemp(prefix=f"nes_scale_annin_{k}_")
        for k in ("plain", "idem", "ptr")
    }
    walls = {}
    try:
        for k in ("plain", "idem"):
            similarity.ivfpq_write(enc, cents, books, paths[k])
        similarity.ivfpq_write(
            enc, cents, books, paths["ptr"], swap_mode="pointer"
        )
        t0 = time.perf_counter()
        similarity.ivfpq_append(spark, paths["plain"], batch)
        walls["plain_append"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        similarity.ivfpq_append(spark, paths["idem"], batch, if_absent=True)
        walls["if_absent_first"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        similarity.ivfpq_append(spark, paths["idem"], batch, if_absent=True)
        walls["if_absent_replay"] = time.perf_counter() - t0
        n_after = spark.read.parquet(paths["idem"] + "/codes").count()
        t0 = time.perf_counter()
        state = similarity.ivfpq_recover(spark, paths["idem"])
        walls["recover_healthy"] = time.perf_counter() - t0
        # pointer-protocol twin (r14): the same sink steps through the
        # object-store-safe layout — per-batch costs must stay in the
        # same class (the extra work is one small-object pointer GET
        # per resolve), and the compact swap itself one pointer PUT +
        # one prefix delete instead of two directory renames
        t0 = time.perf_counter()
        similarity.ivfpq_append(spark, paths["ptr"], batch, if_absent=True)
        walls["ptr_if_absent_first"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        similarity.ivfpq_append(spark, paths["ptr"], batch, if_absent=True)
        walls["ptr_if_absent_replay"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        ptr_state = similarity.ivfpq_recover(spark, paths["ptr"])
        walls["ptr_recover_healthy"] = time.perf_counter() - t0
        corpus = emb.select("vec_id", "embedding")
        t0 = time.perf_counter()
        similarity.ivfpq_compact(spark, paths["idem"], corpus, seed=42)
        walls["compact_rename_swap"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        similarity.ivfpq_compact(spark, paths["ptr"], corpus, seed=42)
        walls["compact_pointer_swap"] = time.perf_counter() - t0
        ptr_base = similarity.resolve_index_base(spark, paths["ptr"])
        n_ptr = spark.read.parquet(ptr_base + "/codes").count()
    finally:
        for p in paths.values():
            shutil.rmtree(p, ignore_errors=True)
    emb.unpersist()
    assert state == "ok" and n_after == n_base + n_batch
    assert ptr_state == "ok" and ptr_base.endswith("/v1")
    assert n_ptr == n_base + n_batch

    report = {
        "metric": "ann_ingest_idempotence_tax",
        "index_rows": n_base,
        "batch_rows": n_batch,
        "walls_sec": {k: round(v, 3) for k, v in walls.items()},
        "tax_first_delivery": round(
            walls["if_absent_first"] / walls["plain_append"], 2
        ),
    }
    print(json.dumps(report))
    lines = [
        "",
        "## Streaming index append: the idempotence tax (32x embeddings)",
        "",
        f"{n_base}-row persisted IVF-PQ index, one {n_batch}-row ingest "
        "batch. `if_absent=True` (what the streaming sink uses) "
        "anti-joins the encoded batch's ids against ONLY the cluster "
        "partitions the batch lands in — partition pruning keeps the "
        "probe proportional to touched-cell size, not index size.",
        "",
        "| path | wall s |",
        "|---|---|",
        f"| plain append (not replay-safe) | {walls['plain_append']:.2f} |",
        f"| if_absent append, first delivery | {walls['if_absent_first']:.2f} |",
        f"| if_absent append, REDELIVERY (writes 0 rows) | {walls['if_absent_replay']:.2f} |",
        f"| ivfpq_recover, healthy layout (per-batch hygiene) | {walls['recover_healthy']:.3f} |",
        f"| POINTER layout: if_absent first / replay | {walls['ptr_if_absent_first']:.2f} / {walls['ptr_if_absent_replay']:.2f} |",
        f"| POINTER layout: recover, healthy | {walls['ptr_recover_healthy']:.3f} |",
        f"| full compact, rename swap (2 dir renames) | {walls['compact_rename_swap']:.1f} |",
        f"| full compact, pointer swap (1 PUT + prefix delete) | {walls['compact_pointer_swap']:.1f} |",
        "",
        f"First-delivery tax: {report['tax_first_delivery']}x the plain "
        "append — the price of surviving at-least-once redelivery "
        "without a registry. The redelivery itself costs one encode + "
        "anti-join and writes nothing; the healthy-recover check the "
        "sink runs every batch is three existence RPCs (plus one "
        "small-object pointer GET under the r14 object-store-safe "
        "pointer protocol, whose per-batch and compact-swap costs sit "
        "in the same class as the rename protocol on local FS — on "
        "S3-class stores the comparison inverts entirely, since the "
        "rename 'swap' there is a full copy of the codes tree).",
        "",
    ]
    _append_named_section(
        lines, "## Streaming index append: the idempotence tax"
    )
    spark.stop()


def run_image_neardup() -> None:
    """Image near-dedup scaling: the banded dHash join's cost driver is
    BUCKET OCCUPANCY (true duplicate-group size), not corpus size —
    candidate pairs grow with Σ n_bucket², so a corpus whose duplicate
    groups double produces 4× the pair work regardless of total rows.
    Measured by hashing doc-keyed synthetic images at increasing doc
    counts (group size grows linearly with count under the fixed 64-
    group construction — the worst case), plus one max_bucket-capped
    run showing the skew knob bounding the blow-up. Writes a section
    into BENCH_scale.md."""
    from pyspark.sql import functions as F

    from near_event_streams_spark.operators import multimodal
    from near_event_streams_spark.session import get_spark

    if not os.path.isdir(SCALE_DIR):
        raise SystemExit("no .scale_data — run `python bench_scale.py --gen` first")
    spark = get_spark(app_name="bench_image_neardup")
    spark.sparkContext.setLogLevel("ERROR")
    docs_all = spark.read.parquet(
        os.path.join(SCALE_DIR, "documents.parquet")
    )

    def build_media(n_docs):
        docs = docs_all.filter(F.col("doc_id") < n_docs)
        d = F.col("doc_id").cast("long")
        g = d % 64
        w = (g % 5 + 6).cast("int")
        h = (g % 3 + 6).cast("int")
        samples = F.transform(
            F.sequence(F.lit(0), (w * h * 3 - 1).cast("long")),
            lambda i: (g * 37 + i * 11) % 240
            + F.when((d * 31 + i * 17) % 97 == 0, F.lit(12)).otherwise(
                F.lit(0)
            )
            + d % 3,
        )
        ppm = F.concat(
            F.lit("P3\n"), w.cast("string"), F.lit(" "),
            h.cast("string"), F.lit("\n255\n"),
            F.array_join(samples, " "),
        )
        return multimodal.as_media_table(
            docs.select(d.alias("doc_id"), ppm.alias("img")),
            id_col="doc_id",
            payload_col="img",
        )

    rows = []
    for n_docs in (5000, 10000, 20000):
        hashed = multimodal.dhash_images(build_media(n_docs)).persist()
        hashed.count()
        occ = (
            hashed.select(
                F.posexplode("bands").alias("band_idx", "band_val")
            )
            .groupBy("band_idx", "band_val")
            .count()
            .agg(
                F.max("count").alias("mx"),
                F.count(F.lit(1)).alias("n_buckets"),
            )
            .first()
        )
        # r11 Next #4: at 20k docs sweep the knob instead of the single
        # recall-destroying 200 cap (max occupancy there is 2170 — a cap
        # below the true duplicate-group size drops REAL pairs, so the
        # production recipe needs the measured pairs-vs-wall curve, not
        # one point)
        caps = (None, 200) if n_docs < 20000 else (None, 2400, 1000, 200)
        for cap in caps:
            t0 = time.perf_counter()
            n_pairs = multimodal.neardup_image_pairs(
                hashed, max_bucket=cap
            ).count()
            rows.append(
                (n_docs, int(occ["n_buckets"]), int(occ["mx"]), n_pairs,
                 round(time.perf_counter() - t0, 2), cap)
            )
            print(f"n_docs={n_docs} cap={cap}: {rows[-1]}")
        hashed.unpersist()

    report = {
        "metric": "image_neardup_pair_scaling",
        "rows": [
            {
                "n_docs": r[0], "n_buckets": r[1],
                "max_bucket_occupancy": r[2], "pairs": r[3],
                "wall_sec": r[4], "max_bucket": r[5],
            }
            for r in rows
        ],
    }
    print(json.dumps(report))
    lines = [
        "",
        "## Image near-dedup: pair volume tracks bucket occupancy, not corpus size",
        "",
        "Doc-keyed synthetic images under the fixed 64-group construction —",
        "the ADVERSARIAL shape where duplicate-group size grows linearly",
        "with the corpus, so verified pairs grow quadratically. That",
        "quadratic lives in the DATA (every in-group pair really is a",
        "near-dup); the banded join never does all-pairs work across",
        "groups, and `max_bucket` bounds per-bucket work when monoculture",
        "buckets appear:",
        "",
        "| docs | band buckets | max occupancy | verified pairs | wall s | max_bucket |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]} | "
            f"{r[5] if r[5] else '—'} |"
        )
    lines += [
        "",
        "A real 100 TB corpus has bounded duplicate-group sizes (its",
        "duplication RATE), so pair volume scales linearly with rows at",
        "fixed rate; the capped runs show the knob that enforces that",
        "bound when the data lies about it. The 20k-doc cap SWEEP is the",
        "production recipe's trade-off: a cap ABOVE the ceiling (2400 >",
        "2170) keeps every pair but PAYS for the occupancy-count pass",
        "with nothing to prune (34.1 s vs 27.0 s uncapped) - the knob",
        "only earns its scan when it drops something; a cap just below",
        "the ceiling (1000) keeps 99.92% of pairs at 1.4x less wall;",
        "a cap far below it (200) keeps almost nothing because nearly",
        "all pairs live in over-cap groups. Set max_bucket from the",
        "expected duplicate-group ceiling (slightly below, never far",
        "below), and leave it off when no monoculture is expected.",
        "",
    ]
    _append_named_section(
        lines,
        "## Image near-dedup",
        next_markers=[
            "## Incremental near-dup probe",
            "## Appendix: skew-adversarial stress",
        ],
    )


def run_graph_powerlaw() -> None:
    """Triangle census under power-law degree skew (r11 Next #3).

    The standing 1.0x-wall-at-10x-edges evidence for
    `graph.triangle_count` is uniform-degree (supplier co-purchase);
    the realistic 100 TB graph is power-law, where naive wedge
    enumeration is quadratic in the max degree. The degree-oriented
    formulation bounds every node's ORIENTED out-degree by ~sqrt(2m)
    regardless of its raw degree — hubs become wedge TARGETS, not wedge
    pivots — so the stress here is: same sampled-edge volume, uniform
    vs two power-law tails (inverse-CDF `floor(N * u^{1/(1-a)})`,
    endpoint weight ~ x^-a), measuring wall, max raw degree, max
    oriented out-degree vs the sqrt(2m) bound, and the wall ratio.
    Generated Spark-side (seeded rand over a fixed-partition range —
    no driver materialization), so the recipe itself is the 100 TB
    shape. Writes a section into BENCH_scale.md."""
    from pyspark.sql import functions as F

    from near_event_streams_spark.operators.graph import triangle_count
    from near_event_streams_spark.session import get_spark

    spark = get_spark(app_name="bench_graph_powerlaw")
    spark.sparkContext.setLogLevel("ERROR")

    n_nodes = 100_000
    n_samples = 2_000_000

    def endpoints(alpha: float | None, seed: int):
        base = spark.range(0, n_samples, 1, 32)

        def node(s):
            u = F.rand(s)
            if alpha is None:
                return F.floor(u * n_nodes).cast("long")
            return F.floor(
                F.lit(float(n_nodes)) * F.pow(u, 1.0 / (1.0 - alpha))
            ).cast("long")

        return base.select(
            node(seed).alias("src"), node(seed + 1).alias("dst")
        )

    rows = []
    for label, alpha, seed in (
        ("uniform", None, 101),
        ("power-law a=0.7", 0.7, 202),
        ("power-law a=0.85", 0.85, 303),
    ):
        edges = endpoints(alpha, seed)
        # graph stats outside the timed region (same dedup the census
        # itself applies; distinct so both shapes pay identical setup)
        e = (
            edges.select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .persist()
        )
        m = e.count()
        deg = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .count()
        )
        max_deg = deg.agg(F.max("count")).first()[0]
        # oriented out-degree: the quantity the O(m^1.5) bound caps
        ed = (
            e.join(deg.withColumnRenamed("v", "a").withColumnRenamed("count", "da"), "a")
            .join(deg.withColumnRenamed("v", "b").withColumnRenamed("count", "db"), "b")
        )
        lt = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
        )
        max_out = (
            ed.select(F.when(lt, F.col("a")).otherwise(F.col("b")).alias("u"))
            .groupBy("u")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        e.unpersist()
        spark.catalog.clearCache()

        walls = []
        tri = None
        for _ in range(3):
            t0 = time.perf_counter()
            tri = triangle_count(edges).first()["n_triangles"]
            walls.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        wall = statistics.median(walls)
        rows.append(
            {
                "graph": label,
                "n_edges": m,
                "max_degree": int(max_deg),
                "max_oriented_outdeg": int(max_out),
                "sqrt_2m": int((2 * m) ** 0.5),
                "triangles": int(tri),
                "wall_sec": round(wall, 2),
            }
        )
        print(rows[-1])

    base_wall = rows[0]["wall_sec"]
    for r in rows:
        r["vs_uniform"] = round(r["wall_sec"] / base_wall, 2)
    print(json.dumps({"metric": "triangle_powerlaw_stress", "rows": rows}))

    lines = [
        "",
        "## Triangle census under power-law degree skew",
        "",
        f"Same sampled-edge volume ({n_samples:,} endpoint samples over",
        f"{n_nodes:,} nodes, Spark-side seeded generation, post-distinct",
        "edge counts below), uniform vs two power-law tails (endpoint",
        "weight ~ x^-a). The degree-oriented wedge join bounds every",
        "node's ORIENTED out-degree by ~sqrt(2m) no matter how hot the",
        "hub — hubs are wedge targets, not pivots — so per-pivot wedge",
        "work cannot go quadratic in the hub degree:",
        "",
        "| graph | edges | max degree | max oriented out-deg | sqrt(2m) | triangles | wall s | vs uniform |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['graph']} | {r['n_edges']} | {r['max_degree']} | "
            f"{r['max_oriented_outdeg']} | {r['sqrt_2m']} | "
            f"{r['triangles']} | {r['wall_sec']} | {r['vs_uniform']}x |"
        )
    lines += [
        "",
        "Reading: the hub's RAW degree explodes under the tail while the",
        "oriented out-degree stays under the sqrt(2m) ceiling — the wall",
        "tracks triangle/wedge OUTPUT volume (real work), not hub degree.",
        "Heavy-hitter vertex splitting is therefore not implemented: the",
        "orientation already is the mitigation (r10 verdict #5 resolved",
        "by measurement).",
        "",
    ]
    _append_named_section(lines, "## Triangle census under power-law degree skew")
    spark.stop()


def _append_named_section(
    lines: list[str],
    own_marker: str,
    next_markers: list[str] | None = None,
    md_path: str | None = None,
) -> None:
    """Replace-or-insert a named section in BENCH_scale.md.

    An existing section is replaced IN PLACE and runs exactly to the
    next ``## `` heading — whatever that heading is. The old scheme
    bounded the replacement by a hand-maintained ``next_markers`` list,
    which silently DELETED every unlisted section sitting between a
    writer's own heading and the first listed marker (r13: the
    ``--ivfpq-persist`` refresh swallowed the freshly measured
    compaction tables because its list skipped "## IVF-PQ compaction";
    the incremental-probe writer would have eaten three sections).

    ``next_markers`` now only decides WHERE a section appearing for the
    FIRST time is inserted: before the first listed marker present in
    the file (default: before the skew appendix, keeping it last),
    else appended at the end. ``md_path`` overrides the target file
    (tests splice against a scratch copy)."""
    import re

    if md_path is None:
        md_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_scale.md"
        )
    next_markers = next_markers or ["## Appendix: skew-adversarial stress"]
    with open(md_path) as f:
        content = f.read()
    block = "\n".join(lines).strip("\n")
    own_at = re.search(
        rf"^{re.escape(own_marker)}", content, flags=re.MULTILINE
    )
    if own_at:
        head = content[: own_at.start()]
        rest = content[own_at.end() :]
        nxt = re.search(r"^## ", rest, flags=re.MULTILINE)
        tail = rest[nxt.start() :] if nxt else ""
        content = head.rstrip() + "\n\n" + block + "\n\n" + tail
    else:
        for m_ in next_markers:
            at = re.search(
                rf"^{re.escape(m_)}", content, flags=re.MULTILINE
            )
            if at:
                content = (
                    content[: at.start()].rstrip()
                    + "\n\n"
                    + block
                    + "\n\n"
                    + content[at.start() :]
                )
                break
        else:
            content = content.rstrip() + "\n\n" + block + "\n"
    with open(md_path, "w") as f:
        f.write(content)
    print(f"wrote {md_path}")


def run_image_ingest() -> None:
    """Streaming image-ingest throughput: N synthetic images through
    ``start_incremental_image_ingest`` (decode → dHash → pruned
    registry probe → corpus append → atomic band-key commit) as real
    micro-batches. Reports images/s sustained and the suppression rate
    the duplicate-heavy construction implies. Writes a section into
    BENCH_scale.md."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from near_event_streams_spark.session import get_spark
    from near_event_streams_spark.streaming import ingest as ing

    if not os.path.isdir(SCALE_DIR):
        raise SystemExit("no .scale_data — run `python bench_scale.py --gen` first")
    spark = get_spark(app_name="bench_image_ingest")
    spark.sparkContext.setLogLevel("ERROR")

    N_DOCS, N_BATCHES = 10000, 4
    docs = (
        spark.read.parquet(os.path.join(SCALE_DIR, "documents.parquet"))
        .filter(F.col("doc_id") < N_DOCS)
    )
    d = F.col("doc_id").cast("long")
    g = d % 64
    w = (g % 5 + 6).cast("int")
    h = (g % 3 + 6).cast("int")
    samples = F.transform(
        F.sequence(F.lit(0), (w * h * 3 - 1).cast("long")),
        lambda i: (g * 37 + i * 11) % 240
        + F.when((d * 31 + i * 17) % 97 == 0, F.lit(12)).otherwise(F.lit(0))
        + d % 3,
    )
    ppm = F.concat(
        F.lit("P3\n"), w.cast("string"), F.lit(" "),
        h.cast("string"), F.lit("\n255\n"), F.array_join(samples, " "),
    )
    media = docs.select(
        d.alias("media_id"), F.encode(ppm, "UTF-8").alias("payload")
    )

    base = tempfile.mkdtemp(prefix="nes_scale_imgingest_")
    try:
        src = os.path.join(base, "src")
        os.makedirs(src)
        # one parquet file per micro-batch, deterministic mtimes
        for b in range(N_BATCHES):
            media.filter(d % N_BATCHES == b).coalesce(1).write.parquet(
                os.path.join(src, f"b{b}")
            )
        stream = (
            spark.readStream.schema("media_id long, payload binary")
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/b*")
        )
        t0 = time.perf_counter()
        q = ing.start_incremental_image_ingest(
            stream,
            os.path.join(base, "corpus"),
            os.path.join(base, "registry"),
            os.path.join(base, "ckpt"),
        )
        q.awaitTermination(600)
        wall = time.perf_counter() - t0
        accepted = spark.read.parquet(os.path.join(base, "corpus")).count()
    finally:
        shutil.rmtree(base, ignore_errors=True)

    rate = N_DOCS / wall
    report = {
        "metric": "image_ingest_images_per_sec",
        "images": N_DOCS,
        "batches": N_BATCHES,
        "wall_sec": round(wall, 2),
        "images_per_sec": round(rate, 1),
        "accepted": accepted,
        "suppressed_pct": round(100 * (1 - accepted / N_DOCS), 1),
    }
    print(json.dumps(report))
    lines = [
        "",
        "## Streaming image ingest: decode -> dHash -> pruned probe -> commit",
        "",
        f"{N_DOCS} synthetic images in {N_BATCHES} micro-batches through",
        "`start_incremental_image_ingest` (real Structured Streaming",
        "foreachBatch: Arrow-batched decode+dHash, bucket-pruned registry",
        "probe, effectively-once corpus append, atomic band-key commit):",
        "",
        "| images | batches | wall s | images/s | accepted | suppressed |",
        "|---|---|---|---|---|---|",
        f"| {N_DOCS} | {N_BATCHES} | {wall:.1f} | {rate:.0f} | "
        f"{accepted} | {100 * (1 - accepted / N_DOCS):.1f}% |",
        "",
        "The duplicate-heavy 64-group construction makes most arrivals",
        "near-dups of already-registered content — the suppression-rate",
        "worst case. Per-trigger cost is O(batch + touched registry",
        "buckets); the corpus itself is never re-read, so the rate holds",
        "as the registry grows (same store contract as the text-ingest",
        "probe-latency curve above).",
        "",
    ]
    _append_named_section(lines, "## Streaming image ingest")


if __name__ == "__main__":
    import sys

    if "--gen-skew" in sys.argv:
        gen_skew()
    elif "--gen" in sys.argv:
        gen()
    elif "--skew" in sys.argv:
        run_skew()
    elif "--neardup-latency" in sys.argv:
        run_neardup_latency()
    elif "--image-ingest" in sys.argv:
        run_image_ingest()
    elif "--graph-powerlaw" in sys.argv:
        run_graph_powerlaw()
    elif "--ivfpq-compact" in sys.argv:
        run_ivfpq_compact()
    elif "--ann-ingest" in sys.argv:
        run_ann_ingest()
    elif "--containment-cap" in sys.argv:
        run_containment_cap()
    elif "--image-neardup" in sys.argv:
        run_image_neardup()
    elif "--ivfpq-persist" in sys.argv:
        run_ivfpq_persist()
    elif "--ivfpq" in sys.argv:
        run_ivfpq()
    else:
        run()
