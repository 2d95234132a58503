"""Sequence packing for LLM pretraining [EXT — north-star pipeline op]:
assign every document its position in the concatenated token stream and
the fixed-length training sequence where it starts — the concat-and-chunk
batch-assembly step that follows cleaning/dedup in a training-data
pipeline (documents are concatenated in a deterministic order, the stream
is cut into seq_len-token windows, and a doc belongs to the window
containing its first token).

The core primitive is a GLOBAL EXCLUSIVE PREFIX SUM over a total order —
the textbook single-task funnel if written as one unpartitioned window.
The scale shape here is the classic two-level decomposition:

1. group = id div group_width — a deterministic, data-independent range
   bucketing (no sampling, engine-reproducible);
2. per-group exclusive prefix sums via a window PARTITIONED by group
   (embarrassingly parallel);
3. group totals → one tiny window over #groups rows → exclusive group
   offsets, broadcast back and added.

Level-3 is bounded by #groups (= max_id / group_width), not corpus rows;
pick group_width so that table stays a few million rows at most (the same
domain-bounded-window argument as the quality-decile histogram). The
result equals the single-window form exactly — pytest pins the
equivalence across group widths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens: Column,
    seq_len: int,
    group_width: int = 100_000,
) -> DataFrame:
    """(id, n_tokens, start_off, seq_id, seq_offset) for every row:
    ``start_off`` = tokens preceding this doc in id order, ``seq_id`` =
    start_off div seq_len (the training sequence holding the doc's first
    token), ``seq_offset`` = position within that sequence. ``id_col``
    must be numeric and unique — the deterministic concatenation order."""
    if seq_len <= 0 or group_width <= 0:
        raise ValueError("seq_len and group_width must be positive")
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.expr(f"{id_col} div {group_width}").alias("__grp"),
    )
    w_loc = (
        Window.partitionBy("__grp")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "__prev", F.coalesce(F.sum("n_tokens").over(w_loc), F.lit(0))
    )
    gtot = base.groupBy("__grp").agg(F.sum("n_tokens").alias("__gtot"))
    # global window over the BOUNDED group-total table (corpus /
    # group_width rows, shrunk by the groupBy above) — machine-checked
    # by plans/lint.py unbounded-global-window
    w_grp = Window.orderBy("__grp").rowsBetween(Window.unboundedPreceding, -1)
    goff = gtot.select(
        "__grp",
        F.coalesce(F.sum("__gtot").over(w_grp), F.lit(0)).alias("__goff"),
    )
    return (
        local.join(F.broadcast(goff), "__grp")
        .select(
            id_col,
            "n_tokens",
            (F.col("__prev") + F.col("__goff")).alias("start_off"),
        )
        .withColumn("seq_id", F.expr(f"start_off div {seq_len}"))
        .withColumn("seq_offset", F.col("start_off") % seq_len)
    )
