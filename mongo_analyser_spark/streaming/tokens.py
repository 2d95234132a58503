"""Incremental token-budget accounting — the `tokens` CLI report as a
continuously-updating Structured Streaming query [EXT].

A corpus-build run tracks "how many training tokens per source so far"
while ingestion proceeds; batch recounting per refresh re-reads the
corpus. The streaming twin keeps the SAME plan as the batch accounting
(whitespace count expression + the Arrow-batched BPE stage with the
merge table as broadcast data) and maintains per-source running totals:
each micro-batch folds only NEW documents into the aggregate.

Scale notes:
* `mapInPandas` is a stateless streaming transformation — the BPE stage
  runs per micro-batch exactly like the batch path (same broadcast merge
  table, same per-task word memo).
* State is O(#sources) rows of count/sum partials — constant size, no
  per-document streaming state.
* Complete output mode: the result IS the per-source budget table
  (~#sources rows); re-emitting it per trigger beats sink-side merges.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`documents` as an unbounded stream: readStream over the same
    parquet (schema from a driver-side batch probe; file-stream source
    needs a glob, not a bare single-file path — see stream_events)."""
    path = os.path.join(sf_dir, "documents.parquet")
    from mongo_analyser_spark.sources.parquet import table_schema

    raw_schema = table_schema(spark, path)
    return spark.readStream.schema(raw_schema).parquet(
        os.path.join(sf_dir, "documents.*")
    )


def token_budget_stream(
    sdf: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Streaming per-source token accounting: (source, n_docs,
    ws_tokens, bpe_tokens, bpe_to_ws_ratio). Write with
    ``.writeStream.outputMode("complete")``. The identical builder runs
    in batch (it IS the `tokens` CLI aggregation grouped by source), so
    batch output certifies the streaming query's semantics."""
    from mongo_analyser_spark.functions.bpe import with_bpe_token_count
    from mongo_analyser_spark.functions.text import token_count

    counted = with_bpe_token_count(
        sdf.select(
            F.col(source_col),
            token_count(text_col).cast("long").alias("__ws"),
            F.col(text_col),
        ),
        text_col,
        merges,
        "__bpe",
    )
    return (
        counted.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__ws").alias("ws_tokens"),
            F.sum("__bpe").alias("bpe_tokens"),
        )
        .withColumn(
            "bpe_to_ws_ratio",
            F.round(F.col("bpe_tokens") / F.col("ws_tokens"), 4),
        )
    )
