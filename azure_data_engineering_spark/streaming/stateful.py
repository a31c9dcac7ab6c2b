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
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})


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
        user_id = int(key[0])
        seen = self._lifetime.get()[0] if self._lifetime.exists() else 0
        for pdf in rows:
            seen += len(pdf)
            for etype, grp in pdf.groupby("event_type"):
                if self._types.containsKey((etype,)):
                    n, total = self._types.getValue((etype,))
                else:
                    n, total = 0, 0.0
                self._types.updateValue(
                    (etype,), (n + len(grp), total + float(grp["value"].sum()))
                )
        self._lifetime.update((seen,))
        out = sorted((k[0], v[0], v[1]) for k, v in self._types.iterator())
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "event_type": [o[0] for o in out],
                "n_events": [o[1] for o in out],
                "total_value": [round(o[2], 2) for o in out],
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
