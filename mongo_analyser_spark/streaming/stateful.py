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


# --- transformWithStateInPandas (Spark 4's successor API) ------------------
# Same per-user profile as running_user_totals, expressed as a
# StatefulProcessor with an explicit ValueState handle — the API Spark 4
# positions to replace applyInPandasWithState (typed state primitives:
# value/list/map state, timers, TTL). Shipping both shows the operator is
# API-portable: the state layout and arithmetic are identical.

try:  # import guard: keeps this module importable on older Spark
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotalsProcessor(StatefulProcessor):
        """ValueState('n','total','last_ts') folded per input batch;
        emits the refreshed profile row for each key seen in the batch."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n bigint, total double, last_ts timestamp"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total, last_ts = self._state.get()
            else:
                n, total, last_ts = 0, 0.0, None
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                batch_max = pdf["ts"].max()
                if last_ts is None or batch_max > last_ts:
                    last_ts = batch_max
            self._state.update((n, total, last_ts))
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

        def close(self) -> None:
            pass

    def running_user_totals_tws(events: DataFrame) -> DataFrame:
        """transformWithStateInPandas form of ``running_user_totals`` —
        identical semantics, typed ValueState instead of the tuple-state
        GroupState. The API requires the RocksDB state store provider
        (its typed-state column families aren't implemented by the
        default HDFS-backed store), so it's pinned here; RocksDB is also
        what a 100 TB deployment runs for incremental checkpointing."""
        events.sparkSession.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        return events.groupBy("user_id").transformWithStateInPandas(
            UserTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - pyspark < 4
    UserTotalsProcessor = None

    def running_user_totals_tws(events: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "transformWithStateInPandas requires pyspark >= 4.0"
        )
