"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.9/§2.10 [EXT]) — the escape hatch for semantics Spark's
built-in windowed aggregates can't express.

The operator here maintains per-user running totals (event count, value
sum, last-seen timestamp) as explicit keyed state, updated per
micro-batch and queryable continuously — the "profile table maintained
from a stream" shape an LLM-data pipeline uses for per-source quotas and
freshness tracking.

Scale notes: state lives in the state store keyed by user — O(#users),
not O(#events); rows reach Python as Arrow batches per key group (Pandas,
not row-at-a-time). The batch twin (`user_totals_batch`) is the same
arithmetic as one groupBy — used by tests to pin the stream's answer and
available to the DuckDB oracle.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_ts timestamp"
)
STATE_SCHEMA = "n bigint, total double, last_ts timestamp"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the running state
    and emit the refreshed totals row."""
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if last_ts is None or batch_max > last_ts:
            last_ts = batch_max
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "n_events": n,
                "total_value": round(total, 2),
                "last_ts": last_ts,
            }
        ]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Continuously-updated per-user profile over an event stream.
    Streaming input → applyInPandasWithState; emits one row per user per
    micro-batch with the state-so-far."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the same totals as one grouped aggregate (what the
    stream converges to after ingesting the same files)."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.max("ts").alias("last_ts"),
    )
