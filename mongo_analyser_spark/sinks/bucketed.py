"""Bucketed parquet sink [EXT]: pre-shuffled, co-located storage so
repeated equi-joins and aggregations on the bucket key run with ZERO
exchange at read time.

The reference's storage layer has no analog (Mongo collections are not
join-partitioned); this is the Spark-native answer to the workload its
users run repeatedly — schema ⋈ stats by field path, orders ⋈ customer
by custkey — where re-shuffling the fact table on every query is the
100-TB bottleneck. Writing `bucketBy(k, key)` hash-partitions rows into
k files per partition ONCE; every later join or groupBy on that key
reads the buckets as pre-shuffled input (`.explain` shows a
SortMergeJoin with no Exchange on either side).

Scale notes:
* bucket count is a storage-time decision: pick so one bucket of the
  LARGER table fits an executor's memory (e.g. 100 TB / 4096 buckets ≈
  25 GB splits → finer buckets or composite keys as data grows).
* both join sides must be bucketed INTO THE SAME COUNT on the SAME key
  for the exchange to disappear; a mismatched side falls back to a
  normal shuffle (Spark reads buckets as a hint, not a contract
  violation).
* `sortBy` within buckets additionally removes the join's Sort step and
  gives row-group zone maps their best ordering (see
  sources/parquet.describe_indexes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as a bucketed parquet table named ``table`` (an
    external table at ``path`` when given, else in the session
    warehouse). Returns the re-read table, whose scans are
    bucket-partitioned on ``keys``."""
    spark = df.sparkSession
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry (external data files are left in place)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
