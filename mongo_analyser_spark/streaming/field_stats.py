"""Incremental field statistics — the reference's flagship analyzer as a
continuously-updating Structured Streaming query.

Reference parity: the reference recomputes its per-field stats on demand
over a bounded cursor sample (mongo_analyser/core/analyser.py:251-257 —
re-running the fold each time the TUI refreshes). The streaming twin
keeps the SAME melt → one-groupBy plan (operators/field_stats.py) but
maintains it incrementally: each micro-batch folds new documents into
per-field aggregate state, so the monitor's cost per refresh is the new
data, not the collection.

Scale notes:
* State is O(#fields) rows of constant-size partial aggregates —
  count/min/max fold; cardinality is HLL++ (`approx_count_distinct`,
  the documented 100-TB default of the batch path) because EXACT
  count_distinct would keep O(#distinct) streaming state and is
  rejected by Spark in streaming aggregations anyway.
* Complete output mode: the result IS the per-field summary table
  (~#fields rows), re-emitting it fully per trigger is cheaper than
  sink-side merge logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from mongo_analyser_spark.operators.field_stats import _stats_agg
from mongo_analyser_spark.operators.melt import melt


def field_stats_stream(
    sdf: DataFrame, json_cols: dict[str, T.StructType] | None = None
) -> DataFrame:
    """Streaming per-field stats over an unbounded document stream:
    presence count, missing %, HLL cardinality, numeric/temporal min-max.

    Pass a streaming DataFrame (e.g. `streaming.windows.stream_events`);
    the result is a complete-mode aggregate — write it with
    ``.writeStream.outputMode("complete")``.  The identical builder runs
    in batch (it IS the batch `field_stats(approx=True)` plan), so batch
    output certifies the streaming query's semantics.
    """
    return _stats_agg(melt(sdf, json_cols), approx=True)
