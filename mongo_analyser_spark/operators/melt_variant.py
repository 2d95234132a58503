"""Dynamic-document melt over VariantType (Spark 4): schema inference for
ARBITRARY JSON documents with no predeclared schema.

This is the fully-general form of the reference's per-document fold
(mongo_analyser/core/analyser.py:32-211): `melt()` (operators/melt.py)
needs the JSON column's shape up front (`json_cols`); here
`parse_json` + iterated `variant_explode` discovers dotted paths and
per-document observed types engine-side — no Python in the loop, no
sampling, whole-stage codegen throughout.

Semantics matched to the reference:
* nested objects recurse into dotted paths (analyser.py:44-45), bounded
  by ``max_depth`` (the reference recurses unbounded; a depth bound is
  the distributed-safety valve — raise it per call when needed);
* object nodes themselves appear as 'dict' rows (analyser.py:82-88);
* arrays do NOT recurse — they surface as `array<T>`/`array<mixed>`
  labels from the variant type (README.md:168, analyser.py:96-121);
* plain JSON ints label `int32` like the reference labels Python ints
  (analyser.py:174-175); JSON has no Int64 marker.

Where the reference's schema is last-writer-wins over cursor order
(analyser.py:186) — meaningless under distribution — the schema artifact
here elects the MOST COMMON type per path (ties: label ascending) and
always ships the full observed histogram, which SURVEY §1.3 notes is the
truthful answer anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ref_label(vtype: Column) -> Column:
    """variant type string (schema_of_variant output) → reference label."""
    inner = F.regexp_extract(vtype, r"^ARRAY<(.*)>$", 1)
    inner_label = (
        F.when(inner == "BIGINT", "int32")
        .when(inner == "STRING", "str")
        .when(inner == "BOOLEAN", "bool")
        .when(inner.rlike("^(DOUBLE|FLOAT|DECIMAL)"), "double")
        .when(inner == "VOID", "null")
        .when(inner.rlike("^OBJECT"), "dict")
        .when(inner.rlike("^VARIANT"), "mixed")
        .otherwise("mixed")
    )
    return (
        F.when(vtype == "BIGINT", "int32")
        .when(vtype == "STRING", "str")
        .when(vtype == "BOOLEAN", "bool")
        .when(vtype.rlike("^(DOUBLE|FLOAT|DECIMAL)"), "double")
        .when(vtype == "VOID", "null")
        .when(vtype.rlike("^OBJECT"), "dict")
        .when(vtype.rlike("^ARRAY"), F.concat(F.lit("array<"), inner_label, F.lit(">")))
        .otherwise(F.concat(F.lit("unknown<"), vtype, F.lit(">")))
    )


def melt_variant(
    df: DataFrame, doc_col: str, id_col: str | None = None,
    max_depth: int | None = 4,
    adaptive: bool = False,
) -> DataFrame:
    """Melt a JSON-string document column into
    (``id_col``?, path, type_tag, value_json) rows — one row per dotted
    path per document, discovered at runtime.

    Each recursion level is one generator projection (variant_explode);
    object values feed the next level, everything else lands in the
    output. The union of ``max_depth`` levels is linear in input size —
    no joins, no shuffles until the caller aggregates.

    ``adaptive=True`` probes each level's frontier with a LIMIT-1 job at
    BUILD time and stops stacking once no objects remain, so a depth-1
    corpus under max_depth=4 plans 1 level instead of 4 (each dead level
    re-scans the source; round-1 bench flagged the 4-level stack 2.8×).
    The probe on a non-empty frontier early-terminates at the first hit;
    the one full probe scan at the terminating level buys back every
    deeper dead scan. Default False = fully lazy plan, no build jobs.

    ``max_depth=None`` (round 13, verdict-r12 #6) recurses until the
    frontier empties — the reference's unbounded recursion
    (mongo_analyser/core/analyser.py:44-45) — by forcing the adaptive
    probe (a lazily-planned unbounded stack would be infinite) under a
    hard 64-level plan-size ceiling: JSON documents have finite depth,
    but a 1000-level stacked plan would stall Catalyst long before the
    data hurt, so past 64 the truncation documented for bounded mode
    applies. Measured depth 2→10: per-level plan+probe cost is flat
    (SCALE.md round-13 depth table)."""
    ids = [id_col] if id_col else []
    spark = df.sparkSession
    frontier = df.select(
        *ids, F.lit("").alias("__path"), F.parse_json(F.col(doc_col)).alias("__val")
    )
    if max_depth is None:
        adaptive = True
        max_depth = 64
    levels: list[DataFrame] = []
    for level in range(max_depth):
        if adaptive and level > 0 and frontier.limit(1).isEmpty():
            break
        exploded = frontier.lateralJoin(
            spark.tvf.variant_explode(F.col("__val").outer())
        ).select(
            *ids,
            F.when(F.col("__path") == "", F.col("key"))
            .otherwise(F.concat("__path", F.lit("."), "key"))
            .alias("__path"),
            F.col("value").alias("__val"),
            F.schema_of_variant(F.col("value")).alias("__vtype"),
        )
        levels.append(
            exploded.select(
                *ids,
                F.col("__path").alias("path"),
                _ref_label(F.col("__vtype")).alias("type_tag"),
                F.to_json("__val").alias("value_json"),
            )
        )
        frontier = exploded.filter(F.col("__vtype").rlike("^OBJECT")).select(
            *ids, "__path", "__val"
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def infer_schema_variant(
    df: DataFrame, doc_col: str, max_depth: int = 4, adaptive: bool = True
) -> DataFrame:
    """Schema artifact for an unknown JSON column: per dotted path, the
    elected type (most common; ties by label ascending — the
    deterministic replacement for the reference's cursor-order
    last-writer-wins) plus presence count and the full observed-type
    histogram. One aggregation shuffle on (path, type_tag), then a tiny
    per-path reduce."""
    from pyspark.sql import Window

    melted = melt_variant(df, doc_col, max_depth=max_depth, adaptive=adaptive)
    by_type = melted.groupBy("path", "type_tag").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("path").orderBy(F.desc("cnt"), F.asc("type_tag"))
    return (
        by_type.withColumn("__rn", F.row_number().over(w))
        .groupBy("path")
        .agg(
            F.max_by("type_tag", F.col("__rn") == 1).alias("type"),
            F.sum("cnt").alias("n_docs"),
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("type_tag", "cnt")))
            ).alias("type_distribution"),
        )
        .orderBy("path")
    )
