"""Custom stateful streaming operators (applyInPandasWithState).

North-star surface: arbitrary per-key state the built-in windowed
aggregations can't express (BASELINE.json "custom stateful
operators"). State lives in the state store, partitioned by key;
watermark-based timeouts bound its size — the same discipline as
windowed aggs.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

from ..operators.timeseries import _round_away
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate lifetime (count, value-sum) per user across
    micro-batches; emit the running totals once per batch."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [_round_away(total, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user cumulative event count/value across ALL
    micro-batches (state store backed). Works only on streaming frames;
    the batch equivalent is a plain groupBy aggregate."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------- transformWithState
# Spark 4's successor API to applyInPandasWithState: a StatefulProcessor
# object owning MULTIPLE independently-typed state variables (value /
# list / map), optional per-state TTL, and timers — per-key state is
# still hash-partitioned into the state store, so memory scales with
# keys-per-executor, not corpus size, at any cluster width.

TWS_OUTPUT_SCHEMA = (
    "user_id bigint, event_type string, n_events bigint, "
    "total_value double, lifetime_events bigint"
)


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class UserTypeTotalsProcessor(StatefulProcessor):
    """Per-user running totals BY EVENT TYPE, plus a lifetime event
    counter — two state variables of different shapes on one key:

    - ``type_totals``: MapState(event_type -> (n, total)) — unbounded
      per-type accumulators the flat applyInPandasWithState tuple
      state cannot express without serializing the whole map per
      update;
    - ``lifetime``: ValueState(n bigint) — a scalar counter.

    Emission per micro-batch, for every user WITH input in that batch:
    the user's full per-type map (sorted by type for a deterministic
    row set) joined with the lifetime count. With deterministic batch
    boundaries this emission history is replayable in plain SQL — the
    oracle recomputes each batch-prefix aggregate."""

    def init(self, handle) -> None:
        self._types = handle.getMapState(
            "type_totals", "event_type string", "n bigint, total double"
        )
        self._lifetime = handle.getValueState("lifetime", "n bigint")

    def handleInputRows(self, key, rows, timerValues):
        # State-server round trips are the cost driver (each one is a
        # proto message over the local socket, serialized in Python):
        # read the WHOLE map once up front (the emission needs it all
        # anyway), merge the batch locally, write back only the types
        # this batch touched. get() returning None replaces the
        # exists()/containsKey() pre-flight — one round trip, not two.
        # Arithmetic is unchanged: per touched type, stored + this
        # batch's len/sum exactly as the per-call form computed it.
        user_id = int(key[0])
        lifetime = self._lifetime.get()
        seen = lifetime[0] if lifetime is not None else 0
        cur = {k[0]: (v[0], v[1]) for k, v in self._types.iterator()}
        touched = set()
        for pdf in rows:
            seen += len(pdf)
            for etype, grp in pdf.groupby("event_type"):
                n, total = cur.get(etype, (0, 0.0))
                cur[etype] = (n + len(grp), total + float(grp["value"].sum()))
                touched.add(etype)
        for etype in touched:
            self._types.updateValue((etype,), cur[etype])
        self._lifetime.update((seen,))
        out = sorted((k, v[0], v[1]) for k, v in cur.items())
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "event_type": [o[0] for o in out],
                "n_events": [o[1] for o in out],
                "total_value": [_round_away(o[2], 2) for o in out],
                "lifetime_events": [seen] * len(out),
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def running_user_type_totals(events: DataFrame) -> DataFrame:
    """Streaming: transformWithStateInPandas over (user_id) keys with
    map-typed + value-typed state (see UserTypeTotalsProcessor).
    Update mode; no time semantics (timeMode None) so the emission is
    purely input-driven and batch-replayable."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTypeTotalsProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# --------------------------------------------------------- TWS timers
# The half of the arbitrary-state API that EXPIRES state: per-key
# timers registered against the event-time watermark. The canonical
# use is the session timeout — emit a user's session summary only
# when the watermark proves no more of their events can arrive.

SESSION_TIMEOUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, "
    "first_ts_ms bigint, last_ts_ms bigint"
)


class SessionTimeoutProcessor(StatefulProcessor):
    """Event-time session timeout via TWS timers: accumulate per-user
    (count, value sum, first/last event-time) in a ValueState; after
    every input batch re-arm ONE timer at last_event_time + gap_ms
    (delete-then-register keeps exactly one pending timer per key —
    timers are not per-state TTLs, the processor owns their
    lifecycle). When the watermark passes the pending timer the
    engine calls handleExpiredTimer: emit the closed session row and
    clear the state — the only emission this operator makes, so
    output mode is Append and every row is final.

    Engine ordering contract this relies on (TransformWithStateExec):
    input rows for a batch are processed BEFORE that batch's expired
    timers, so a key with fresh input re-arms its timer first and is
    never closed in the same batch its data arrived."""

    def __init__(self, gap_ms: int):
        self._gap = int(gap_ms)

    def init(self, handle) -> None:
        self._handle = handle
        self._sess = handle.getValueState(
            "session", "n bigint, total double, first_ms bigint, last_ms bigint"
        )

    def handleInputRows(self, key, rows, timerValues):
        # ONE get() (None replaces the exists() pre-flight round trip);
        # the pending timer's expiry is derivable from stored state
        # (always last_ms + gap, by construction below), so the old
        # timer is deleted directly — no listTimers() scan. Each saved
        # call is a proto round trip to the state server per key per
        # batch, the measured cost driver of this operator.
        prior = self._sess.get()
        if prior is not None:
            n, total, first_ms, last_ms = prior
            prior_expiry = last_ms + self._gap
        else:
            n, total, first_ms, last_ms = 0, 0.0, None, None
            prior_expiry = None
        for pdf in rows:
            if len(pdf) == 0:
                continue
            ts = pdf["ts_ms"].astype("int64")
            n += len(pdf)
            total += float(pdf["value"].sum())
            mn, mx = int(ts.min()), int(ts.max())
            first_ms = mn if first_ms is None else min(first_ms, mn)
            last_ms = mx if last_ms is None else max(last_ms, mx)
        # Every Arrow chunk can be empty (the engine may invoke a key
        # with no new rows); with no prior state there is nothing to
        # time out, and last_ms + gap would be None + int.
        if last_ms is None:
            return iter(())
        if prior_expiry is not None:
            self._handle.deleteTimer(prior_expiry)
        self._handle.registerTimer(last_ms + self._gap)
        self._sess.update((n, total, first_ms, last_ms))
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        sess = self._sess.get()
        if sess is not None:
            n, total, first_ms, last_ms = sess
            self._sess.clear()
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "n_events": [int(n)],
                    "total_value": [_round_away(float(total), 2)],
                    "first_ts_ms": [int(first_ms)],
                    "last_ts_ms": [int(last_ms)],
                }
            )

    def close(self) -> None:
        pass


def session_timeouts(
    events: DataFrame,
    gap_ms: int,
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming: close per-user sessions `gap_ms` after their last
    event, proven by the event-time watermark (timeMode EventTime —
    the TWS timer surface). Input needs `ts_col` (timestamp) and
    `value`; emits one Append-mode row per closed session."""
    from pyspark.sql import functions as F

    # INTEGER division micros -> ms: a double quotient (unix_micros/
    # 1000) can round .9999995 up before the bigint cast truncates,
    # shifting a timestamp by 1 ms vs exact integer arithmetic (seen
    # once in ~15k rows at sf0.1) — and the other engines' ns-based
    # double paths disagree in their own way (epoch_ns exceeds 2^53).
    prepared = (
        events.withWatermark(ts_col, watermark_delay)
        .withColumn(
            "ts_ms", F.expr(f"unix_micros({ts_col}) div 1000").cast("bigint")
        )
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionTimeoutProcessor(gap_ms),
        outputStructType=SESSION_TIMEOUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


class IdleKeyFlushProcessor(StatefulProcessor):
    """PROCESSING-time twin of SessionTimeoutProcessor: flush a key's
    accumulated count when no input has arrived for `idle_ms` of WALL
    time (timeMode ProcessingTime — the timer half that needs no
    event-time column: cache eviction, stale-key flush, liveness
    watchdogs). Same lifecycle discipline: one pending timer per key,
    re-armed at currentProcessingTime + idle_ms on every input batch;
    emission only from handleExpiredTimer, which also clears state.
    Wall-clock timers are inherently non-replayable, so this operator
    is live-tested (tests/test_transform_with_state.TestLiveTimers)
    rather than oracle-gated."""

    def __init__(self, idle_ms: int):
        self._idle = int(idle_ms)

    def init(self, handle) -> None:
        self._handle = handle
        self._cnt = handle.getValueState("cnt", "n bigint")

    def handleInputRows(self, key, rows, timerValues):
        cnt = self._cnt.get()  # None replaces the exists() round trip
        n = cnt[0] if cnt is not None else 0
        for pdf in rows:
            n += len(pdf)
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self._idle
        )
        self._cnt.update((n,))
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        cnt = self._cnt.get()
        if cnt is not None:
            self._cnt.clear()
            yield pd.DataFrame({"user_id": [int(key[0])], "n_events": [int(cnt[0])]})

    def close(self) -> None:
        pass


def idle_key_flush(events: DataFrame, idle_ms: int) -> DataFrame:
    """Streaming: emit (user_id, n_events) when a key has seen no
    input for `idle_ms` of processing time, then forget it."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=IdleKeyFlushProcessor(idle_ms),
        outputStructType="user_id bigint, n_events bigint",
        outputMode="Append",
        timeMode="ProcessingTime",
    )


# ----------------------------------------------------- TWS ListState

RECENT_EVENTS_SCHEMA = (
    "user_id bigint, rank int, ts_ms bigint, event_id bigint, value double"
)


class RecentEventsProcessor(StatefulProcessor):
    """Per-user bounded recent-events buffer on ListState — the third
    state shape of the transformWithState API (ValueState and MapState
    are exercised by UserTypeTotalsProcessor/SessionTimeoutProcessor;
    this is the list-typed variant): keep the k most recent events by
    (event time, event_id) across micro-batches, emit the current
    buffer (rank 1 = newest) for every user with input in the batch.
    The "last N actions before X" feature extractor — session replay,
    churn context, fraud look-back — with state bounded at k rows per
    key BY CONSTRUCTION, not by TTL.

    ListState discipline: the buffer is read (bounded: <= k rows),
    merged with the batch, trimmed to k under the deterministic
    (ts_ms, event_id) order, and rewritten with ONE clear+appendList
    — never an unbounded append. Deterministic batch boundaries make
    the emission history replayable in plain SQL (the
    UserTypeTotalsProcessor oracle pattern)."""

    def __init__(self, k: int):
        self._k = int(k)

    def init(self, handle) -> None:
        self._buf = handle.getListState(
            "recent", "ts_ms bigint, event_id bigint, value double"
        )

    def handleInputRows(self, key, rows, timerValues):
        user_id = int(key[0])
        cur = (
            [(int(t), int(e), float(v)) for t, e, v in self._buf.get()]
            if self._buf.exists()
            else []
        )
        got_input = False
        for pdf in rows:
            if len(pdf) == 0:
                continue
            got_input = True
            cur.extend(
                (int(t), int(e), float(v))
                for t, e, v in zip(pdf["ts_ms"], pdf["event_id"], pdf["value"])
            )
        if not got_input:
            return iter(())
        cur.sort(key=lambda r: (-r[0], -r[1]))  # newest first, id tiebreak
        cur = cur[: self._k]
        self._buf.put(cur)  # one replace, never an unbounded append
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(cur),
                "rank": list(range(1, len(cur) + 1)),
                "ts_ms": [r[0] for r in cur],
                "event_id": [r[1] for r in cur],
                "value": [_round_away(r[2], 2) for r in cur],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def recent_events(events: DataFrame, k: int = 3) -> DataFrame:
    """Streaming: per-user k-most-recent events via ListState
    (RecentEventsProcessor). Input needs ts_ms/event_id/value columns;
    Update mode, timeMode None — emission is input-driven and
    batch-replayable."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RecentEventsProcessor(k),
        outputStructType=RECENT_EVENTS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


STREAM_TOPK_SCHEMA = (
    "event_type string, rank int, item bigint, cnt bigint"
)


class StreamingTopKProcessor(StatefulProcessor):
    """Per-key streaming top-k leaderboard on MapState — the live
    "most active items right now" view (top users per event type, top
    SKUs per region, hottest shards per tenant) that a dashboard
    polls from the sink table instead of rescanning history.

    State: MapState(item -> cumulative count). PRECONDITION (the
    state-size contract, same spirit as RecentEventsProcessor's k
    bound): the item domain per key is BOUNDED (buckets, enums,
    capped ids) — this processor keeps exact counts, which is what
    makes its emission history replayable in plain SQL per batch
    prefix; for unbounded domains compose with a hash bucket or use
    the batch Misra-Gries operator (operators/heavy_hitters).

    Emission per micro-batch, for every key WITH input in the batch:
    the current top-k by (count DESC, item ASC) — a deterministic
    total order, so the sink table is hash-comparable across
    engines."""

    def __init__(self, k: int):
        self._k = int(k)

    def init(self, handle) -> None:
        self._counts = handle.getMapState("counts", "item bigint", "cnt bigint")

    def handleInputRows(self, key, rows, timerValues):
        # same round-trip discipline as UserTypeTotalsProcessor: the
        # emission needs the whole map anyway, so read it once, merge
        # the batch locally, write back only touched items
        etype = key[0]
        got = False
        cur = {k2[0]: v[0] for k2, v in self._counts.iterator()}
        touched = set()
        for pdf in rows:
            if len(pdf) == 0:
                continue
            got = True
            for item, grp in pdf.groupby("item"):
                it = int(item)
                cur[it] = cur.get(it, 0) + len(grp)
                touched.add(it)
        if not got:
            return iter(())
        for it in touched:
            self._counts.updateValue((it,), (cur[it],))
        top = sorted(cur.items(), key=lambda r: (-r[1], r[0]))[: self._k]
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "item": [t[0] for t in top],
                "cnt": [t[1] for t in top],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def streaming_top_k(events: DataFrame, k: int = 5) -> DataFrame:
    """Streaming: per-event-type top-k item leaderboard via MapState
    (StreamingTopKProcessor). Input needs event_type/item columns;
    Update mode, timeMode None — emission is input-driven and
    batch-replayable."""
    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=StreamingTopKProcessor(k),
        outputStructType=STREAM_TOPK_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
