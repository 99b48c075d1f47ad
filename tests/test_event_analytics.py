"""Edge-case unit tests for the event-analytics family (round-4
operators gated only through the sf0.01 oracle until now): SCD2,
forward as-of with tolerance, ordered funnel, and rolling-distinct
DAU/WAU/MAU — driven through the REAL registered plan callables over a
crafted events.parquet, so the exact code the driver gates is what the
fixtures exercise (mirrors tests/test_timeseries.py's approach for the
timeseries family).

Fixture timeline (all users < 15 so the SCD2 cohort filter keeps them):

  2024-01-01  u1 view,view,view          (all-same-state stream)
              u2 click                   (single-event user)
              u3 click, view, purchase   (out-of-order funnel steps)
              u4 view, click, purchase   (clean funnel completion)
              u5 purchase+error same instant; purchase, error +31min
              u7 view+click same instant (strictly-after boundary)
  2024-01-04  u6 view                    (activity gap on 01-02/01-03)
"""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry

D0 = dt.datetime(2024, 1, 1)


def _ts(h=0, m=0, s=0, day=0):
    return D0 + dt.timedelta(days=day, hours=h, minutes=m, seconds=s)


EVENTS = [
    # (event_id, ts, user_id, event_type)
    (1, _ts(0, 1), 1, "view"),
    (2, _ts(0, 2), 1, "view"),
    (3, _ts(0, 3), 1, "view"),
    (4, _ts(0, 5), 2, "click"),
    (5, _ts(0, 10), 3, "click"),
    (6, _ts(0, 20), 3, "view"),
    (7, _ts(0, 30), 3, "purchase"),
    (8, _ts(0, 10), 4, "view"),
    (9, _ts(0, 20), 4, "click"),
    (10, _ts(0, 30), 4, "purchase"),
    (11, _ts(1, 0), 5, "purchase"),
    (12, _ts(1, 0), 5, "error"),
    (13, _ts(2, 0), 5, "purchase"),
    (14, _ts(2, 31), 5, "error"),
    (15, _ts(3, 0), 7, "view"),
    (16, _ts(3, 0), 7, "click"),
    (17, _ts(0, 0, 30, day=3), 6, "view"),
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_events")
    table = pa.table(
        {
            "event_id": pa.array([e[0] for e in EVENTS], pa.int64()),
            "ts": pa.array([e[1] for e in EVENTS], pa.timestamp("us")),
            "user_id": pa.array([e[2] for e in EVENTS], pa.int64()),
            "event_type": pa.array([e[3] for e in EVENTS], pa.string()),
            "value": pa.array([1.0] * len(EVENTS), pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(EVENTS), pa.string()),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


def _us(t: dt.datetime) -> int:
    return int((t - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def test_scd2_edge_users(spark, edge_dir):
    rows = (
        entry.queries()["scd2_user_state"](spark, edge_dir)
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)

    # all-same-state stream collapses to ONE current interval
    u1 = by_user[1]
    assert len(u1) == 1
    assert u1[0]["state"] == "view"
    assert u1[0]["effective_from_us"] == _us(_ts(0, 1))
    assert u1[0]["effective_to_us"] is None and u1[0]["is_current"]

    # single-event user: one open interval
    u2 = by_user[2]
    assert len(u2) == 1 and u2[0]["is_current"]
    assert u2[0]["state"] == "click"

    # same-instant state change (purchase+error at 01:00, ids 11/12):
    # event_id breaks the tie, so purchase's interval is zero-length
    u5 = by_user[5]
    assert [r["state"] for r in u5] == [
        "purchase", "error", "purchase", "error",
    ]
    assert u5[0]["effective_from_us"] == u5[0]["effective_to_us"]
    assert u5[1]["effective_to_us"] == _us(_ts(2, 0))
    assert u5[3]["is_current"] and u5[3]["effective_to_us"] is None
    assert sum(r["is_current"] for r in u5) == 1

    # same-instant view+click (ids 15/16): id order, zero-length first
    u7 = by_user[7]
    assert [r["state"] for r in u7] == ["view", "click"]
    assert u7[0]["effective_from_us"] == u7[0]["effective_to_us"]


def test_asof_forward_tie_and_tolerance(spark, edge_dir):
    rows = {
        r["purchase_id"]: r
        for r in entry.queries()["join_asof_forward_tolerance"](
            spark, edge_dir
        ).collect()
    }
    # row set is exactly the purchases — beyond-tolerance and
    # no-error-at-all purchases are NULLED, never dropped
    assert set(rows) == {7, 10, 11, 13}

    # same-instant error IS visible to the purchase (tie pinned by
    # src ordering: purchase sorts before error at equal ts)
    assert rows[11]["next_error_id"] == 12
    assert rows[11]["next_error_ts_us"] == rows[11]["purchase_ts_us"]

    # next error 31min out: beyond the 30min tolerance -> nulled
    assert rows[13]["next_error_id"] is None
    assert rows[13]["next_error_ts_us"] is None

    # users with no error events at all
    assert rows[7]["next_error_id"] is None
    assert rows[10]["next_error_id"] is None


def test_funnel_out_of_order_and_same_instant_steps(spark, edge_dir):
    rows = {
        r["step"]: r
        for r in entry.queries()["funnel_view_click_purchase"](
            spark, edge_dir
        ).collect()
    }
    # viewers: u1, u3, u4, u6, u7
    assert rows[1]["n"] == 5
    # clicks counted only STRICTLY after the first view: u3's click
    # precedes its view, u7's click is the same instant, u2 never
    # viewed -> only u4 converts
    assert rows[2]["n"] == 1
    # u4's purchase is after its click; u3's purchase doesn't count
    # (no qualifying click), u5's purchases lack views entirely
    assert rows[3]["n"] == 1
    assert rows[1]["conv_from_prev"] is None
    assert rows[2]["conv_from_prev"] == pytest.approx(0.2)
    assert rows[3]["conv_from_prev"] == pytest.approx(1.0)


def test_dau_wau_mau_gap_days_and_clip(spark, edge_dir):
    rows = [
        (str(r["report_day"]), r["dau"], r["wau"], r["mau"])
        for r in entry.queries()["active_users_dau_wau_mau"](
            spark, edge_dir
        ).collect()
    ]
    # clipped exactly to the observed [2024-01-01, 2024-01-04]; the
    # zero-DAU gap days 01-02/01-03 keep their rolling WAU/MAU rows
    assert rows == [
        ("2024-01-01", 6, 6, 6),
        ("2024-01-02", 0, 6, 6),
        ("2024-01-03", 0, 6, 6),
        ("2024-01-04", 1, 7, 7),
    ]


def test_active_users_hll_matches_exact_on_fixture(spark, edge_dir):
    rows = entry.queries()["active_users_hll"](spark, edge_dir).collect()
    got = [(str(r["report_day"]), r["dau"], r["wau"], r["mau"]) for r in rows]
    assert got == [
        ("2024-01-01", 6, 6, 6),
        ("2024-01-02", 0, 6, 6),
        ("2024-01-03", 0, 6, 6),
        ("2024-01-04", 1, 7, 7),
    ]
    for r in rows:
        assert r["dau_within_5pct"] and r["wau_within_5pct"]
        assert r["mau_within_5pct"]


def test_pointintime_scd2_zero_length_interval_semantics(spark, edge_dir):
    """Half-open interval lookup: a state opened and closed at the SAME
    instant (u5's purchase+error at 01:00, tie-broken by event_id) is
    zero-length, so the simultaneous purchase resolves to the *error*
    state that superseded it — and every purchase matches exactly one
    interval."""
    rows = {
        r["purchase_id"]: r
        for r in entry.queries()["join_pointintime_scd2"](
            spark, edge_dir
        ).collect()
    }
    assert set(rows) == {7, 10, 11, 13}
    assert rows[7]["state_at_purchase"] == "purchase"
    assert rows[10]["state_at_purchase"] == "purchase"
    # zero-length [T,T) purchase interval is unmatchable; the error
    # state that starts at the same instant wins
    assert rows[11]["state_at_purchase"] == "error"
    assert rows[11]["effective_from_us"] == rows[11]["ts_us"]
    assert rows[13]["state_at_purchase"] == "purchase"


def test_cusum_alarms_planted_step_change(spark, tmp_path_factory):
    """CUSUM on a planted mean shift: quiet period (values below the
    allowance keep S clamped at 0, no alarms), then a level shift whose
    per-step excess accumulates past the threshold — alarm count and
    peak statistic are hand-computable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("cusum_events")
    # user 1: 10 quiet samples (3.0), then 10 shifted samples (20.0)
    # allowance 5, threshold 50: S rises 15/step after the shift,
    # exceeding 50 from step 4 -> alarms on shifted steps 4..10 = 7
    vals = [3.0] * 10 + [20.0] * 10
    table = pa.table(
        {
            "event_id": pa.array(range(len(vals)), pa.int64()),
            "ts": pa.array(
                [_ts(0, i) for i in range(len(vals))], pa.timestamp("us")
            ),
            "user_id": pa.array([1] * len(vals), pa.int64()),
            "event_type": pa.array(["metric"] * len(vals), pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * len(vals), pa.string()),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    rows = entry.queries()["feature_cusum_alarms"](
        spark, str(d)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_alarms"] == 7
    assert r["max_cusum"] == 150.0  # 10 shifted steps x (20 - 5)


def test_session_window_exact_gap_inclusive_boundary(spark, edge_dir):
    """r17 registry addition: grid-aligned timestamps make EVERY
    adjacent-cell pair sit exactly gap apart, so this pins Spark's
    inclusive session_window merge (diff == gap merges; verified
    empirically on Spark 4.1) on data where the boundary actually
    fires — microsecond-random testdata never exercises it, which is
    how the pre-r17 session_window_native oracle could claim an
    exclusive end and stay green."""
    rows = entry.queries()["session_window_exact_gap"](
        spark, edge_dir
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)

    # u3: cells 00:10 / 00:20 / 00:30 — each neighbor EXACTLY one gap
    # (10 min) apart -> ONE merged session spanning all three cells
    u3 = by_user[3]
    assert len(u3) == 1
    assert u3[0]["session_start_us"] == _us(_ts(0, 10))
    assert u3[0]["session_end_us"] == _us(_ts(0, 40))  # last cell + gap
    assert u3[0]["n_events"] == 3

    # u5: cells 01:00(x2) / 02:00 / 02:30 — every inter-cell gap is
    # > 10 min, so three sessions; the same-cell pair collapses
    u5 = sorted(by_user[5], key=lambda r: r["session_start_us"])
    assert [(r["session_start_us"], r["n_events"]) for r in u5] == [
        (_us(_ts(1, 0)), 2),
        (_us(_ts(2, 0)), 1),
        (_us(_ts(2, 30)), 1),
    ]

    # u1: three events inside ONE cell -> one session of the cell span
    u1 = by_user[1]
    assert len(u1) == 1 and u1[0]["n_events"] == 3
    assert u1[0]["session_start_us"] == _us(_ts(0, 0))
    assert u1[0]["session_end_us"] == _us(_ts(0, 10))


def test_session_window_native_merges_exact_gap_pair(
    spark, tmp_path_factory
):
    """r17 fix: session_window_native's oracle used >= gap (exclusive
    end) while Spark's native session_window MERGES a pair exactly gap
    apart. Two events exactly 30 minutes apart must come back as ONE
    session ending at last + gap — the batch twin of the stateful
    sessionizer's inclusive-merge contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("exact_gap_events")
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [_ts(1, 0), _ts(1, 30)], pa.timestamp("us")
            ),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["view", "view"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    rows = entry.queries()["session_window_native"](
        spark, str(d)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_events"] == 2
    assert r["session_start_us"] == _us(_ts(1, 0))
    assert r["session_end_us"] == _us(_ts(2, 0))  # 01:30 + 30min gap
    assert r["session_value"] == 3.0


def test_window_rolling_distinct_frame_semantics(spark, edge_dir):
    """r17 registry addition: size(array_distinct(collect_list)) over
    a 10-row frame == COUNT(DISTINCT) OVER (the DuckDB oracle). Pins
    the frame semantics on crafted data: running distinct grows only
    on genuinely new types, same-instant ties ordered by event_id."""
    rows = entry.queries()["window_rolling_distinct"](
        spark, edge_dir
    ).collect()
    by_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(
            r["n_distinct_types_10"]
        )

    assert by_user[1] == [1, 1, 1]          # view, view, view
    assert by_user[3] == [1, 2, 3]          # click, view, purchase
    # u5: purchase/error same instant (event_id tie), purchase, error
    assert by_user[5] == [1, 2, 2, 2]
    # u7: view+click at the same instant -> second row sees both
    assert by_user[7] == [1, 2]
