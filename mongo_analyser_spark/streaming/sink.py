"""Exactly-once streaming parquet sink (ST sink tier, [EXT]) —
``foreachBatch`` with idempotent batch replay.

Structured Streaming's contract after a crash is at-least-once delivery
of the LAST uncommitted micro-batch to the sink: the checkpoint commits
the batch AFTER ``foreachBatch`` returns, so a failure in between
replays the same (batch_id, data) on restart. File sinks that blindly
append therefore duplicate that batch. The standard fix (documented in
the Spark structured-streaming guide's foreachBatch section) is to make
the write IDEMPOTENT in ``batch_id``: here each micro-batch lands in
its own ``__batch_id=N`` partition via DYNAMIC partition overwrite, so
a replayed batch overwrites exactly its own partition and the sink
converges to exactly-once output no matter how many times the last
batch retries.

100-TB shape: one partition directory per micro-batch (readers prune on
any other predicate as usual; a compaction job can fold old batch
partitions into the corpus layout — the sinks/rollup.py pattern). The
batch id is data lineage worth keeping anyway: it is the unit of
reprocessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_batch_idempotent(df: DataFrame, batch_id: int, path: str) -> None:
    """The foreachBatch body: write ``df`` under ``__batch_id=N`` with
    dynamic partition overwrite — replaying the same batch overwrites
    its own partition instead of appending duplicates. Exposed
    separately so tests (and reprocessing jobs) can invoke a replay
    directly."""
    (
        df.withColumn("__batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(path)
    )


def exactly_once_parquet_writer(sdf: DataFrame, path: str, checkpoint: str):
    """A ``DataStreamWriter`` whose sink is exactly-once under replay:
    ``.start()`` it (or ``.trigger(availableNow=True)`` for drain-and-
    stop). Output rows carry the extra ``__batch_id`` lineage column."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        write_batch_idempotent(df, batch_id, path)

    return (
        sdf.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )
