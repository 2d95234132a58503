"""Incremental schema-inference monitor (ST11 [EXT]) — the reference's
CORE capability (per-path observed-type histograms,
mongo_analyser/core/analyser.py:51,192,286) as a continuously-updating
Structured Streaming query.

The reference infers schema in one shot over a sample; a production
analyser wants the live version — "which dotted paths, with which
observed types, have arrived so far" — without re-scanning the corpus
per refresh. The melt is stateless (parse_json + iterated
variant_explode, operators/melt_variant.py — no probes, no driver
actions in the streaming plan: ``adaptive`` stays off and the level
stack is a fixed ``max_depth``), and the histogram is an additive
(path, type_tag) counter — order- and partition-independent, so the
streaming complete-mode output equals the identically-built batch
histogram EXACTLY (the ST7/ST10 contract, exact integers throughout).

Scale notes:
* State is O(#paths × #types) count partials — the schema vocabulary,
  not the corpus.
* The variant explode multiplies rows inside the task before the ONE
  groupBy shuffle; map-side combine collapses each micro-batch to the
  path-type vocabulary.
* Complete output mode: the result IS the live schema histogram; the
  batch dynamic_schema_histogram_events row is its oracle-checked twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo_analyser_spark.operators.melt_variant import melt_variant


def schema_histogram_stream(
    sdf: DataFrame, doc_col: str, max_depth: int = 2
) -> DataFrame:
    """Streaming per-path observed-type histogram: (path, type_tag, n).
    Write with ``.writeStream.outputMode("complete")``. The builder is
    the batch melt + groupBy itself, so the batch output certifies the
    streaming semantics (tests/test_streaming.py, incl. a stop/append/
    restart boundary)."""
    return (
        melt_variant(sdf, doc_col, max_depth=max_depth, adaptive=False)
        .groupBy("path", "type_tag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
