"""Stateful / windowed streaming operators beyond plain tumbling windows.

Completes SURVEY §2.2's streaming rows:

* **sliding windows** — built-in ``F.window(ts, duration, slide)``.
* **session windows** — built-in ``F.session_window`` (gap-based, merges
  as events arrive; watermark closes sessions).
* **custom stateful operator** — gap-based sessionization implemented
  directly on ``applyInPandasWithState``: per-key state carries the
  key's PENDING sessions (every interval the watermark hasn't
  finalized — r16: not just the open one, so a within-watermark
  straggler merges into an already-gap-separated span exactly as
  ``F.session_window`` would); an event-time timeout flushes sessions
  once the watermark passes their end+gap. This is the escape hatch
  for stateful semantics the built-ins can't express (the reference
  has no equivalent — it delegates all stateful consumption to Kafka
  consumers; SURVEY §2.2 "streaming: stateful ops").

Scale notes: all three shuffle once on the grouping key; state lives in
the state store partitioned the same way (RocksDB provider on a real
cluster — no longer just a claim: the sessionizer runs under
``RocksDBStateStoreProvider`` including a checkpoint restart in
``tests/test_stateful_streaming.py::
test_sessionizer_rocksdb_state_store_restart``). Watermarks bound state
size — without them session state grows forever at 100 TB/day ingest.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --------------------------------------------------------------------------
# built-in window shapes
# --------------------------------------------------------------------------


def sliding_event_counts(
    events: DataFrame,
    ts_col: str = "event_ts",
    key_col: str = "event_type",
    duration: str = "2 minutes",
    slide: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Overlapping-window counts: each event lands in duration/slide
    windows (here 2). Watermark drops late rows and finalizes windows."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), duration, slide).alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "key",
            "n_events",
        )
    )


def session_window_stats(
    events: DataFrame,
    ts_col: str = "event_ts",
    key_col: str = "user_id",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Built-in gap-based session windows: sessions merge while events
    keep arriving within ``gap``; the watermark closes them."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("s"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("session_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "key",
            "n_events",
            "session_value",
        )
    )


# --------------------------------------------------------------------------
# custom stateful operator: sessionization on applyInPandasWithState
# --------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
    ]
)

# state: PARALLEL ARRAYS over the key's PENDING session intervals —
# every interval whose end+gap the watermark has not yet passed, kept
# sorted by start. Pre-r16 state held a single open-session tuple and
# emitted gap-separated intervals the moment a batch sweep separated
# them; that finalizes sessions EARLIER than the watermark contract, so
# a later within-watermark straggler within gap of one emitted as a
# second fragment where F.session_window would merge (r15 advice).
# Holding sub-watermark intervals costs O(pending sessions per key)
# state — bounded by the watermark delay over the gap, the same bound
# F.session_window's own state carries. (State schema changed r16:
# restarting a pre-r16 checkpoint needs a fresh checkpoint dir.)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", ArrayType(LongType())),
        StructField("last_us", ArrayType(LongType())),
        StructField("n", ArrayType(LongType())),
        StructField("total", ArrayType(DoubleType())),
    ]
)


def make_session_func(gap_seconds: int):
    """Build the per-key stateful function. Emits one row per session
    FINALIZED by the watermark: an interval is emitted only once the
    watermark STRICTLY passes its ``end + gap`` — before that, a late
    event inside the watermark (including one at exactly
    ``end + gap``, which merges: F.session_window's inclusive
    semantics) could still merge into it, so it rides in state even
    when the current batch's sweep already gap-separated it from its
    successor. Pending
    intervals flush either on a later batch for the key or via the
    event-time timeout (armed at the EARLIEST pending ``end + gap``)."""
    gap_us = gap_seconds * 1_000_000
    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        def emit(start_us: int, last_us: int, n: int, total: float):
            return pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "session_value": [total],
                }
            )

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        def unpack() -> list[list]:
            starts, lasts, ns, totals = state.get
            return [
                list(iv) for iv in zip(starts, lasts, ns, totals)
            ]

        def settle(intervals: list[list]):
            """Emit every interval the watermark has FINALIZED (no
            acceptable future event — ts >= watermark — can be within
            gap of it); hold the rest in state with the timeout armed
            at the earliest pending finalization. STRICT (end+gap <
            wm): at wm == end+gap an event at exactly ts == wm is
            still acceptable AND merges under the inclusive sweep, so
            finalizing at <= made exactly-gap-spaced session
            boundaries depend on whether the watermark happened to
            land on end+gap between batches (r16 advice)."""
            ready = [iv for iv in intervals if iv[1] + gap_us < wm_us]
            held = [iv for iv in intervals if iv[1] + gap_us >= wm_us]
            if held:
                state.update(
                    (
                        [iv[0] for iv in held],
                        [iv[1] for iv in held],
                        [int(iv[2]) for iv in held],
                        [float(iv[3]) for iv in held],
                    )
                )
                # clamped: Spark rejects timeouts at/behind the current
                # watermark (floor division can land exactly on it)
                state.setTimeoutTimestamp(
                    max(
                        min(iv[1] for iv in held) // 1000 + gap_ms,
                        wm_ms + 1,
                    )
                )
            elif state.exists:
                state.remove()
            return ready

        if state.hasTimedOut:
            # the watermark passed the earliest pending end+gap: flush
            # what it finalized, keep the rest pending
            for iv in settle(unpack()):
                yield emit(*iv)
            return

        rows = pd.concat(list(pdfs)).sort_values("ts_us")
        # Sorted interval sweep over {pending session spans} ∪ {each
        # event as a point interval}, merging neighbors within gap —
        # the F.session_window merge semantics. This replaces the r14
        # hull-merge, whose merge test (ts - last_us <= gap) was
        # vacuously true for any ts < last_us: a late event arriving
        # MORE than gap before the open session's start was absorbed
        # into it, so the reported span could contain an internal
        # silence longer than the gap — session_window would emit that
        # event as its own session (r14 advisory). Late events within
        # the watermark merge only with spans they are genuinely
        # within gap of — including spans the sweep separated in an
        # EARLIER batch, which stay mergeable until the watermark
        # passes their end+gap (r15 advice; they are in `intervals`
        # here, not already emitted).
        intervals = unpack() if state.exists else []
        for ts, val in zip(rows["ts_us"], rows["value"]):
            intervals.append([int(ts), int(ts), 1, float(val)])
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
        merged = [intervals[0]]
        for iv in intervals[1:]:
            cur = merged[-1]
            # INCLUSIVE merge is the contract: F.session_window merges
            # events spaced EXACTLY gap apart (verified empirically —
            # two events at t and t+gap yield ONE native session
            # [t, t+2*gap), pinned by the exact-gap test), so the
            # sweep must too. Consistency with finalization comes from
            # settle() being STRICT (end+gap < wm), not from
            # strictening the merge (r16 advice, option 2).
            if iv[0] - cur[1] <= gap_us:
                cur[1] = max(cur[1], iv[1])
                cur[2] += iv[2]
                cur[3] += iv[3]
            else:
                merged.append(iv)
        for iv in settle(merged):
            yield emit(*iv)

    return fn


def sessionize_stateful(
    events: DataFrame,
    ts_col: str = "event_ts",
    key_col: str = "user_id",
    value_col: str = "value",
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom gap-sessionization via applyInPandasWithState (event-time
    timeout). Unlike ``session_window_stats`` this formulation controls
    exactly what state is kept and emitted — the template for stateful
    semantics Spark has no built-in for (e.g. per-key decaying counters,
    order-book state, cross-event pattern matches).

    .. warning:: the state schema changed in r16 (single open-session
       tuple → parallel arrays of pending intervals). Spark's state
       store validates state schema compatibility on restart, so a
       query restarted from a pre-r16 checkpoint FAILS at start with a
       schema-compatibility error (loud, not silent) — drain the old
       query, then restart with a fresh checkpoint directory. There is
       no in-place migration path for applyInPandasWithState state."""
    prepared = events.withWatermark(ts_col, watermark).select(
        F.col(key_col).cast("string").alias("key"),
        (F.unix_micros(F.col(ts_col))).alias("ts_us"),
        F.col(value_col).cast("double").alias("value"),
        F.col(ts_col),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        make_session_func(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --------------------------------------------------------------------------
# stream-stream join: clicks ⋈ purchases within a time bound
# --------------------------------------------------------------------------


def attribute_purchases_to_clicks(
    clicks: DataFrame,
    purchases: DataFrame,
    key_col: str = "user_id",
    attribution_window: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to clicks by the
    same user within the preceding attribution window.

    Both sides are watermarked and the join condition carries the time
    bound — that pair is what lets Spark expire join state (a click older
    than watermark + window can never match a future purchase and is
    dropped from the state store). Without the time bound the state grows
    unboundedly; with it this is the canonical scalable stream-stream
    join. Scale: one shuffle per side on the join key; state is
    per-key-and-time-bounded in the state store.
    """
    c = clicks.select(
        F.col(key_col).alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("event_ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col(key_col).alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
        F.col("event_ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return c.join(p, cond).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_value",
        "purchase_ts",
        "click_id",
        "click_ts",
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 successor API): running totals
# --------------------------------------------------------------------------


def running_totals_tws(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) on the ``transformWithStateInPandas``
    API — Spark 4's successor to applyInPandasWithState, with composable
    typed state (value/list/map states, timers) instead of a single
    state tuple. Update mode: every micro-batch emits the keys it
    touched with their new cumulative totals.

    Scale: identical shuffle/state-store shape to the older API (one
    shuffle on the key; RocksDB state store on a cluster); the win is
    the state model, not the plan.

    Runtime requirement: the TWS Python worker talks protobuf to the
    JVM state server — needs a working ``google.protobuf`` install
    (absent in some minimal containers; sessionize_stateful on
    applyInPandasWithState is the dependency-free fallback).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n bigint, total double"
            )

        def handleInputRows(self, key, rows, timer_values):
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"key": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    prepared = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("key").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="key string, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def session_timeout_tws(
    events: DataFrame,
    gap: str = "10 minutes",
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Timer-driven SESSION TIMEOUT emission on transformWithStateInPandas
    — the use-case the older applyInPandasWithState expresses only via
    GroupStateTimeout: each key accumulates an open session; every input
    batch re-arms a processing-time timer at ``last activity + gap``;
    when the timer EXPIRES (no activity for a full gap) the closed
    session is emitted exactly once and the state cleared. Unlike
    ``sessionize_stateful`` (which emits on the NEXT event after the
    gap), the timer closes idle sessions with no further traffic — the
    24/7-ingest shape where the last session of a departed user must
    still flush.

    Scale: identical to any keyed-state operator — one shuffle on the
    key, per-key state O(1) (five scalars), timers are state-store
    entries, not threads. Timer discipline: exactly ONE armed timer per
    key (the previous one is deleted before re-arming), so the timer
    count is bounded by live keys.

    Runtime requirement: same protobuf-backed TWS Python worker as
    :func:`running_totals_tws` (env-skipped where absent;
    ``sessionize_stateful`` is the dependency-free fallback).
    """
    # validate the gap BEFORE the stateful-processor import so bad
    # arguments fail with a clear message even in environments where
    # the protobuf-backed TWS worker is absent
    import re

    _units = {"millisecond": 1, "second": 1000, "minute": 60_000,
              "hour": 3_600_000, "day": 86_400_000}
    parts = gap.strip().split()
    # ASCII-digit regex, not str.isdigit(): isdigit() accepts Unicode
    # digit chars (e.g. '²') that int() rejects, and '0 seconds' would
    # arm a zero-length gap — both must hit the friendly message
    if (
        len(parts) != 2
        or not re.fullmatch(r"[0-9]+", parts[0])
        or int(parts[0]) == 0
    ):
        raise ValueError(
            f"session_timeout_tws: gap must be '<n> <unit>' with n a "
            f"positive integer and unit in "
            f"{sorted(_units)} (optionally plural), got {gap!r}"
        )
    unit = parts[1].rstrip("s")
    if unit not in _units:
        raise ValueError(
            f"session_timeout_tws: unsupported gap unit {parts[1]!r} — "
            f"supported: {sorted(_units)} (optionally plural)"
        )
    gap_ms = int(parts[0]) * _units[unit]

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionTimeout(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState(
                "sess",
                "n bigint, total double, start_ms bigint, last_ms bigint",
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._sess.exists():
                n, total, start_ms, last_ms = self._sess.get()
            else:
                n, total, start_ms, last_ms = 0, 0.0, None, None
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                lo = int(pdf["ts_ms"].min())
                hi = int(pdf["ts_ms"].max())
                start_ms = lo if start_ms is None else min(start_ms, lo)
                last_ms = hi if last_ms is None else max(last_ms, hi)
            self._sess.update((n, total, start_ms, last_ms))
            # exactly one armed timer per key: drop the stale one, re-arm
            # a full gap past the batch's processing time
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + gap_ms
            )
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._sess.exists():
                n, total, start_ms, last_ms = self._sess.get()
                self._sess.clear()
                yield pd.DataFrame(
                    {
                        "key": [key[0]],
                        "n_events": [n],
                        "total_value": [total],
                        "session_start_ms": [start_ms],
                        "session_end_ms": [last_ms],
                    }
                )

        def close(self) -> None:
            pass

    prepared = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
    )
    return prepared.groupBy("key").transformWithStateInPandas(
        statefulProcessor=SessionTimeout(),
        outputStructType=(
            "key string, n_events bigint, total_value double, "
            "session_start_ms bigint, session_end_ms bigint"
        ),
        outputMode="Append",
        timeMode="ProcessingTime",
    )
