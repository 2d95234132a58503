"""Stream-stream event-time interval join (SURVEY §2.9 [EXT]).

The reference has no streaming joins; this extends the streaming tier
(streaming/windows.py) with the remaining core Structured Streaming
operator: joining two event streams on a key within an event-time bound
("purchase within N hours of the click").

The builder works UNCHANGED in batch and streaming mode — the same
degenerate-to-batch contract as the windowing builders: `withWatermark`
is a no-op on a batch plan, so the DuckDB oracle checks the batch twin
and the streaming test runs the SAME builder over `readStream`.

Scale notes:
* the join shuffles both streams on the equi-keys; the time-range
  conjunct rides the hash join as a post-filter (never a broadcast
  nested loop, because the equi-conjunct anchors the join).
* in streaming mode the interval bound is what makes state FINITE:
  Spark derives each side's state-eviction horizon from the watermark
  plus the time constraint (left rows age out `upper` after their
  event time, right rows at the watermark). An unbounded stream-stream
  join (no time conjunct) would buffer both streams forever and is
  deliberately not exposed here.
* both inputs must come from `stream_events`-style normalized sources
  so the event-time columns carry a proper TIMESTAMP type in every
  testdata encoding (sources/parquet.normalize_event_time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "6 hours",
    watermark: str | None = None,
) -> DataFrame:
    """Inner-join `left` and `right` on `keys` where the right event
    lands inside [left_ts, left_ts + upper]. Columns come out prefixed
    `l_` / `r_` (both sides usually share a schema). When `watermark`
    is given, both sides are watermarked on their event-time column —
    required for streaming mode, harmless no-op in batch."""
    if not keys:
        raise ValueError(
            "interval_join requires at least one equi-key: a pure time-range "
            "stream-stream join cannot anchor a hash join and would plan as "
            "an unbounded nested loop"
        )
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    cond = None
    for k in keys:
        c = F.col(f"l_{k}") == F.col(f"r_{k}")
        cond = c if cond is None else (cond & c)
    lts, rts = F.col(f"l_{left_ts}"), F.col(f"r_{right_ts}")
    cond = cond & (rts >= lts) & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    return l.join(r, cond)
