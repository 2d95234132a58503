"""Incremental heavy-hitter frequency monitor (ST10 [EXT]) — the
count-min sketch (operators/countmin.py) as a continuously-updating
Structured Streaming aggregate.

A 100-TB ingest wants "which keys are hot so far" without per-refresh
recounts and without state that grows with key cardinality. The
count-min sketch is the textbook answer, and it is ALSO a perfect
streaming aggregate: every cell is an additive counter over
(row, bucket) — commutative, order- and partition-independent — so the
streaming complete-mode output equals the identically-built batch
sketch EXACTLY (the ST7/ST9 contract, with no HLL approximation caveat:
cells are exact integers).

Scale notes:
* State is O(d·w) rows — constant, independent of both stream length
  and key cardinality (the dedup monitor's HLL is bounded per GROUP;
  this is bounded GLOBALLY).
* The d-row explode happens inside the task before the shuffle;
  map-side combine caps each micro-batch's shuffle at d·w rows.
* Point estimates (min over d cells) are a cheap join against the
  d·w-row result table — done downstream, not in the stream.
* Complete output mode: the result IS the sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mongo_analyser_spark.operators.countmin import countmin_sketch


def countmin_stream(
    sdf: DataFrame,
    key: Column,
    depth: int = 3,
    width: int = 64,
) -> DataFrame:
    """Streaming count-min sketch: (row, bucket, cnt), at most d·w rows.
    Write with ``.writeStream.outputMode("complete")``. The builder is
    the batch operator itself — same explode, same md5 row-salted
    buckets, same groupBy — so the batch output certifies the streaming
    semantics (tests/test_streaming.py, incl. a stop/restart
    boundary)."""
    return countmin_sketch(sdf, key, depth, width)
