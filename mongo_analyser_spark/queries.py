"""Query registry: every operator from SURVEY.md §2 exposed as a
(spark, sf_dir) -> DataFrame callable, each with a DuckDB oracle-SQL twin.

Determinism rules (the driver compares row-count + schema + order-insensitive
value hash against DuckDB at sf0.01 — SURVEY §5 'our added layer'):
* every computed column is explicitly aliased the same in both engines;
* double aggregates go through decimal casts or ROUND so IEEE
  summation-order differences can't flip a bit;
* timestamps are emitted as formatted strings (engine-native timestamp
  printing differs);
* all top-k / limit queries have total tie-break orders.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_analyser_spark.operators.field_stats import (
    TS_FMT,
    array_element_stats,
    field_stats,
    top_values,
    type_histogram,
)
from mongo_analyser_spark.sources.parquet import (
    EVENTS_PROPS_SCHEMA,
    list_collections,
    load_table,
)

DUCK_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Field-stats family (reference flagship: core/analyser.py §2.4 A1-A9)
# --------------------------------------------------------------------------

# shared melt CTE for the events oracle — mirrors operators/melt.py exactly
_EVENTS_MELT_SQL = """
WITH melt AS (
  SELECT 'event_id' AS field, 'int64' AS tag, event_id IS NOT NULL AS present,
         CAST(event_id AS VARCHAR) AS v_str, CAST(event_id AS DOUBLE) AS v_num,
         CAST(NULL AS TIMESTAMP) AS v_ts FROM events
  UNION ALL
  SELECT 'ts', 'datetime', ts IS NOT NULL, NULL, NULL, CAST(ts AS TIMESTAMP) FROM events
  UNION ALL
  SELECT 'user_id', 'int64', user_id IS NOT NULL, CAST(user_id AS VARCHAR),
         CAST(user_id AS DOUBLE), NULL FROM events
  UNION ALL
  SELECT 'event_type', 'str', event_type IS NOT NULL, event_type, NULL, NULL FROM events
  UNION ALL
  SELECT 'value', 'double', value IS NOT NULL, NULL, value, NULL FROM events
  UNION ALL
  SELECT 'props', 'dict', props IS NOT NULL, props, NULL, NULL FROM events
  UNION ALL
  SELECT 'props.k', 'int64', (props->>'$.k') IS NOT NULL,
         CAST(CAST(props->>'$.k' AS BIGINT) AS VARCHAR),
         CAST(props->>'$.k' AS DOUBLE), NULL FROM events
)
"""


@register(
    "field_stats_events",
    _EVENTS_MELT_SQL
    + f"""
SELECT field,
  CAST(count(*) FILTER (WHERE present) AS BIGINT) AS cnt,
  ROUND((count(*) - count(*) FILTER (WHERE present)) * 100.0 / count(*), 4) AS missing_pct,
  CAST(count(DISTINCT COALESCE(v_str, CAST(v_num AS VARCHAR), CAST(v_ts AS VARCHAR))) AS BIGINT) AS distinct_cnt,
  MIN(v_num) AS min_num, MAX(v_num) AS max_num,
  strftime(MIN(v_ts), '{DUCK_TS_FMT}') AS min_ts,
  strftime(MAX(v_ts), '{DUCK_TS_FMT}') AS max_ts
FROM melt GROUP BY field ORDER BY field
""",
)
def q_field_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return field_stats(ev, {"props": EVENTS_PROPS_SCHEMA})


@register(
    "type_histogram_events",
    _EVENTS_MELT_SQL
    + """
SELECT field, CASE WHEN present THEN tag ELSE 'null' END AS type_tag,
       CAST(count(*) AS BIGINT) AS cnt
FROM melt GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q_type_histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return type_histogram(ev, {"props": EVENTS_PROPS_SCHEMA})


@register(
    "top_values_events",
    _EVENTS_MELT_SQL
    + """
, counted AS (
  SELECT field, v_str AS value, CAST(count(*) AS BIGINT) AS cnt
  FROM melt WHERE present AND tag = 'str' AND length(v_str) < 256
  GROUP BY field, v_str
)
SELECT field, value, cnt, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY field ORDER BY cnt DESC, value ASC) AS rnk
  FROM counted
) WHERE rnk <= 5 ORDER BY field, rnk
""",
)
def q_top_values_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return top_values(ev, {"props": EVENTS_PROPS_SCHEMA})


@register(
    "array_stats_embeddings",
    f"""
WITH elems AS (
  SELECT 'embedding[]' AS field, e IS NOT NULL AS present,
         CAST(e AS DOUBLE) AS v_num
  FROM (SELECT unnest(embedding) AS e FROM embeddings)
)
SELECT field,
  CAST(count(*) FILTER (WHERE present) AS BIGINT) AS cnt,
  ROUND((count(*) - count(*) FILTER (WHERE present)) * 100.0 / count(*), 4) AS missing_pct,
  CAST(count(DISTINCT CAST(v_num AS VARCHAR)) AS BIGINT) AS distinct_cnt,
  MIN(v_num) AS min_num, MAX(v_num) AS max_num,
  CAST(NULL AS VARCHAR) AS min_ts, CAST(NULL AS VARCHAR) AS max_ts
FROM elems GROUP BY field ORDER BY field
""",
)
def q_array_stats_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return array_element_stats(emb, "embedding")


# --------------------------------------------------------------------------
# Scans / sampling / ordering (reference §2.1 S1-S4, §2.6)
# --------------------------------------------------------------------------


@register(
    "newest_n_events",
    f"""
SELECT event_id, strftime(CAST(ts AS TIMESTAMP), '{DUCK_TS_FMT}') AS ts_s,
       user_id, event_type, value, props
FROM events ORDER BY event_id DESC LIMIT 100
""",
)
def q_newest_n_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newest-N scan (reference sort(_id desc).limit(n),
    core/extractor.py:386-393). Spark plans TakeOrderedAndProject — top-K
    without a full sort, safe at any scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("event_id"))
        .limit(100)
        .select(
            "event_id",
            F.date_format("ts", TS_FMT).alias("ts_s"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    )


@register(
    "sample_events_deterministic",
    """
SELECT event_id, user_id, event_type, value FROM events WHERE event_id % 10 = 0
""",
)
def q_sample_events_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% 'sample' (reference $sample is server-side random,
    core/analyser.py:254-257; for oracle determinism we key the sample on
    the id — same pushdown-able filter shape)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") % 10 == 0).select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "list_collections",
    "SELECT * FROM (VALUES ('customer'),('documents'),('embeddings'),('events'),"
    "('lineitem'),('nation'),('orders'),('part'),('region'),('supplier')) t(name) ORDER BY name",
)
def q_list_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted collection list (reference core/analyser.py:227-240)."""
    return list_collections(spark, sf_dir)


@register(
    "describe_collection_events",
    """
SELECT CAST(count(*) AS BIGINT) AS doc_count,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,
       ROUND(CAST(SUM(length(props)) AS DOUBLE) / count(*), 4) AS avg_props_len
FROM events
""",
)
def q_describe_collection_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collStats analog (reference views/db_connection_view.py:197-205):
    doc count / distinct types / average serialized size proxy.
    Average computed as exact integer sum / count (one double division) so
    the DuckDB twin is bit-identical — AVG() accumulation order is not."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.count_distinct("event_type").alias("n_event_types"),
        F.round(
            F.sum(F.length("props")).cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_props_len"),
    )
