"""Event-time windowing and stateful streaming operators (SURVEY §2.9 [EXT]).

The reference has no streaming operators — its only incremental behaviors
are batched cursor consumption and cancellation checkpoints
(mongo_analyser/core/extractor.py:263-335). For the `events` stream table
we expose the Structured Streaming surface mandated by BASELINE.json:
tumbling / sliding / session event-time windows, watermarks with a
late-data drop policy, and stateful dedup.

Every windowing builder here takes a plain DataFrame and works UNCHANGED
in both batch and streaming mode — `F.window` / `F.session_window` are
batch-evaluable, and `withWatermark` is a no-op on a batch plan. That one
code path is the point: the DuckDB oracle checks the batch twin, and the
streaming tests run the SAME builder over `readStream` with a memory sink
and assert it converges to the batch answer.

Scale notes:
* windowed groupBy is a single hash shuffle on (window, keys); partial
  aggregation happens map-side, so state is O(#open windows × #keys),
  not O(#events). Watermarks bound the open-window set on real streams.
* session windows use Spark's native `F.session_window` (merging-session
  state store), not a collect-and-scan UDF.
* streaming dedup state is bounded by `dropDuplicatesWithinWatermark`
  (event-time TTL eviction) — the unbounded `dropDuplicates` variant is a
  100-TB foot-gun on streams and is deliberately not exposed here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongo_analyser_spark.sources.parquet import NANO_TS_COLS, normalize_event_time

#: cross-engine-stable timestamp rendering (microseconds, no tz suffix)
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
#: second-granularity rendering for window boundaries (always whole seconds)
WIN_FMT = "yyyy-MM-dd HH:mm:ss"


def _fmt_window(prefix: str = "window") -> list:
    return [
        F.date_format(F.col(f"{prefix}.start"), WIN_FMT).alias("window_start"),
        F.date_format(F.col(f"{prefix}.end"), WIN_FMT).alias("window_end"),
    ]


def tumbling_counts(
    df: DataFrame,
    ts_col: str,
    width: str,
    keys: list[str] | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows: count + optional value sum per
    window (× optional keys). One shuffle on (window, *keys)."""
    keys = keys or []
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
    out_cols = ["n_events"] + (["sum_value"] if value_col else [])
    return (
        df.groupBy(F.window(ts_col, width).alias("window"), *keys)
        .agg(*aggs)
        .select(*_fmt_window(), *keys, *out_cols)
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Overlapping windows (width > slide ⇒ each event lands in
    width/slide windows). Spark expands the event into its windows before
    the shuffle — same plan shape as tumbling, ×(width/slide) rows."""
    keys = keys or []
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("window"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(*_fmt_window(), *keys, "n_events")
    )


def session_stats(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Session windows: per key, events closer than `gap` merge into one
    session spanning [first_ts, last_ts + gap). Uses Spark's native
    merging-session aggregation (F.session_window)."""
    keys = keys or []
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("session"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min(ts_col), TS_FMT).alias("session_start"),
        )
        .select(
            *keys,
            "session_start",
            F.date_format(F.col("session.end"), TS_FMT).alias("session_end"),
            "n_events",
        )
    )


def with_late_data_policy(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Watermark in streaming mode; in batch mode `withWatermark` is a
    no-op, so the batch twin of "late data is dropped" is an explicit
    filter against the observed high-water mark (max ts - delay). The
    max is a scalar sub-agg broadcast to the scan — no shuffle of the
    fact table."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    hwm = df.agg(
        (F.max(ts_col) - F.expr(f"INTERVAL {delay}")).alias("hwm")
    )
    return df.join(F.broadcast(hwm)).filter(F.col(ts_col) >= F.col("hwm")).drop("hwm")


def streaming_dedup(df: DataFrame, keys: list[str], ts_col: str, delay: str) -> DataFrame:
    """Stateful streaming dedup with bounded state:
    `dropDuplicatesWithinWatermark` evicts seen-keys older than the
    watermark, so state is O(keys seen within `delay`), not O(all keys
    ever). Batch mode falls back to plain dropDuplicates (exact)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def dedup_first_per_key(
    df: DataFrame, keys: list[str], order_cols: list[str]
) -> DataFrame:
    """Deterministic batch twin of streaming dedup: keep the FIRST row per
    key under a total order (dropDuplicates keeps an arbitrary row, which
    no oracle can check). Single window shuffle on keys."""
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` as an unbounded stream: readStream over the same parquet,
    with the same TIMESTAMP(NANOS) → microsecond conversion as the batch
    loader (sources/parquet.py). Schema comes from a driver-side batch
    probe (readStream requires one up front)."""
    path = os.path.join(sf_dir, "events.parquet")
    # same session pinning as load_table: the schema probe must survive a
    # NANOS-encoded file, and watermark arithmetic must render in UTC
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from mongo_analyser_spark.sources.parquet import table_schema

    raw_schema = table_schema(spark, path)
    # the file stream source rejects a plain single-file path ("basePath
    # must be a directory") but accepts the same file via a glob
    df = spark.readStream.schema(raw_schema).parquet(os.path.join(sf_dir, "events.*"))
    return normalize_event_time(df, NANO_TS_COLS.get("events", []))
