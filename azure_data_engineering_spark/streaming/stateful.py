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
