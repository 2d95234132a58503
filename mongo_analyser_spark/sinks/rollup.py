"""Multi-granularity continuous-aggregate sink [EXT — the hypertable
rollup materialized]: compute hourly / daily / grand-total grains of an
event stream in ONE pass (time-dimension GROUPING SETS → a single Expand
+ hash aggregate, one shuffle for every grain) and persist them as a
hive-partitioned, range-clustered parquet artifact that downstream
dashboards read without touching the fact table.

Layout = the incremental-refresh contract:
* partitioned by (grain, day) — a reader of one grain/day range prunes
  every other partition at the SCAN, and a writer can re-materialize just
  the days a late batch touched via dynamic partition overwrite
  (`refresh_rollup`), the standard continuous-aggregate maintenance loop;
* rows inside each partition are sorted by hour so parquet row-group
  zone maps cover disjoint ranges (`export_parquet_sorted`'s trick).

The streaming twin of the hourly grain is
streaming/windows.tumbling_window → sink; this module is the batch /
backfill half of the same rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def time_rollup_grains(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """(grain, day, hour, n_events, sum_value) at grains
    hourly / daily / total — one GROUPING SETS aggregate, the same plan
    shape as queries.time_rollup_events with an explicit grain label
    (derived from grouping() flags) instead of NULL-pattern columns."""
    df.createOrReplaceTempView("__rollup_src")
    return df.sparkSession.sql(
        f"""
        SELECT
          CASE WHEN grouping(date_trunc('hour', {ts_col})) = 0 THEN 'hourly'
               WHEN grouping(to_date({ts_col})) = 0 THEN 'daily'
               ELSE 'total' END AS grain,
          date_format(to_date({ts_col}), 'yyyy-MM-dd') AS day,
          CASE WHEN grouping(date_trunc('hour', {ts_col})) = 0
               THEN date_format(date_trunc('hour', {ts_col}), 'HH') END AS hour,
          count(*) AS n_events,
          CAST(SUM(CAST({value_col} AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM __rollup_src
        GROUP BY GROUPING SETS (
          (to_date({ts_col}), date_trunc('hour', {ts_col})),
          (to_date({ts_col})),
          ())
        """
    )


def materialize_rollup(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    value_col: str = "value",
    mode: str = "overwrite",
) -> None:
    """Write all grains partitioned by (grain, day), hour-sorted within
    each partition. The 'total' grain lands in day=null's default
    partition — readers address it by grain alone."""
    grains = time_rollup_grains(df, ts_col, value_col)
    (
        grains.repartition("grain", "day")
        .sortWithinPartitions("hour")
        .write.mode(mode)
        .partitionBy("grain", "day")
        .parquet(path)
    )


def refresh_rollup(
    df: DataFrame,
    path: str,
    days: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> None:
    """Incremental maintenance: recompute ONLY the named days' hourly and
    daily partitions from (late) fact rows and swap them in via dynamic
    partition overwrite — untouched days' files are left in place, no
    full re-materialization. The 'total' grain is recomputed separately
    by the caller when it matters (a grand total is one row; re-running
    `materialize_rollup` for it defeats the purpose of the day filter).
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    sliced = df.filter(F.date_format(F.to_date(F.col(ts_col)), "yyyy-MM-dd").isin(days))
    grains = time_rollup_grains(sliced, ts_col, value_col).filter(
        F.col("grain") != "total"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            grains.repartition("grain", "day")
            .sortWithinPartitions("hour")
            .write.mode("overwrite")
            .partitionBy("grain", "day")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_rollup(
    spark: SparkSession, path: str, grain: str | None = None
) -> DataFrame:
    """Read the artifact back; a grain filter is a pure partition prune
    (no data files of other grains are opened)."""
    out = spark.read.parquet(path)
    # partition-value inference parses day=yyyy-MM-dd as DATE; the
    # artifact contract is the string form the writer emitted
    out = out.withColumn("day", F.date_format("day", "yyyy-MM-dd"))
    if grain:
        out = out.filter(F.col("grain") == grain)
    return out
