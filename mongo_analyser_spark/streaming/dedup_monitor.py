"""Incremental corpus-dedup health monitor (ST9 [EXT]) — the
`dedup_report_by_source` batch report as a continuously-updating
Structured Streaming query.

A corpus-build run wants "how duplicated is each source so far" while
ingestion proceeds, without re-reading the corpus per refresh: the
batch report recounts everything; this twin folds only NEW documents
into per-source (total, distinct-content) partials.

Scale notes:
* Distinct content is an approx_count_distinct HLL partial — the ONLY
  bounded-state way to track distinct hashes in an unbounded stream
  (an exact distinct would grow state with the corpus; the batch twin
  keeps the exact number). HLL insertion is order- and
  partition-independent, so streaming output == the identically-built
  batch aggregate, exactly — the ST7 field-stats contract.
* State is O(#sources) rows of count + HLL partials, constant size.
* Content hashes via xxhash64 — an 8-byte shuffle key, the dedup-tier
  key discipline.
* Complete output mode: the result IS the per-source health table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_rate_stream(
    sdf: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    rsd: float = 0.02,
) -> DataFrame:
    """Streaming per-source dedup health: (source, n_docs,
    approx_distinct, dup_rate). Write with
    ``.writeStream.outputMode("complete")``. The identical builder runs
    in batch, so the batch output certifies the streaming semantics
    (tests/test_streaming.py, incl. a stop/restart boundary)."""
    h = F.xxhash64(F.col(text_col))
    return (
        sdf.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.approx_count_distinct(h, rsd).alias("approx_distinct"),
        )
        .withColumn(
            "dup_rate",
            F.round(
                1.0 - F.col("approx_distinct") / F.col("n_docs"), 4
            ),
        )
    )
