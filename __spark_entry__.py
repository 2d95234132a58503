"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over mongo_analyser_spark.queries — the registry maps every
implemented operator from SURVEY.md §2 to a (spark, sf_dir) callable plus
a DuckDB oracle-SQL twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-field statistics over the dynamic-schema
    `events` table at sf0.001 — the reference's core computation
    (mongo_analyser/core/analyser.py) as one melt + grouped aggregate."""
    from mongo_analyser_spark.queries import QUERIES

    return QUERIES["field_stats_events"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mongo_analyser_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mongo_analyser_spark.queries import ORACLES

    return dict(ORACLES)
