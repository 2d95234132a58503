"""Document melt: turn a (possibly nested) DataFrame into typed path rows.

This is the canonical Spark rewrite of the reference's per-document fold
(mongo_analyser/core/analyser.py:32-211): instead of a driver-side loop
mutating dict accumulators, each source row explodes into one row per
dotted field path carrying a typed value triple. Every downstream
field-stats aggregate (SURVEY §2.4 A1-A9) is then ONE
``groupBy("field")`` — a single shuffle with map-side partial
aggregation, which is the 100 TB-safe shape.

Melted schema:
    field   string   dotted path ('props.k', 'user.details.age', ...)
    type_tag string  reference type label; 'null' when the value is null
    present boolean  value non-null (reference presence count, analyser.py:68)
    v_str   string   string representation used for distinct / frequency
                     (null for double/timestamp/struct nodes — see notes)
    v_num   double   numeric view (null for non-numerics)
    v_ts    timestamp temporal view (null for non-temporals)

Notes on ``v_str``: doubles and timestamps deliberately do NOT get a
string form — engine-specific float/timestamp printing is not portable
across the DuckDB oracle, and the reference only tracks value
frequencies for strings anyway (analyser.py:202-204). Distinctness for
those types flows through ``v_num`` / ``v_ts``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mongo_analyser_spark.types import ref_type_label

MELT_FIELDS = ["field", "type_tag", "present", "v_str", "v_num", "v_ts"]


def _null(t: str) -> Column:
    # lazy: F.lit requires an active session, so no module-level constants
    return F.lit(None).cast(t)


def _entry(path: str, dtype: T.DataType, col: Column) -> Column:
    """One melted struct for a leaf (or node) at `path`."""
    label = ref_type_label(dtype)
    v_str, v_num, v_ts = _null("string"), _null("double"), _null("timestamp")
    if isinstance(dtype, (T.StringType,)):
        v_str = col
    elif isinstance(dtype, T.BooleanType):
        v_str = col.cast("string")
    elif isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        v_str = col.cast("string")
        v_num = col.cast("double")
    elif isinstance(dtype, (T.FloatType, T.DoubleType)):
        v_num = col.cast("double")
    elif isinstance(dtype, T.DecimalType):
        v_str = col.cast("string")
        v_num = col.cast("double")
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        v_ts = col.cast("timestamp")
    elif isinstance(dtype, T.DateType):
        v_ts = col.cast("timestamp")
    elif isinstance(dtype, T.BinaryType):
        v_str = F.lower(F.hex(col))
    # struct / map / array nodes: presence + type only (leaves carry values)
    return F.struct(
        F.lit(path).alias("field"),
        F.when(col.isNull(), F.lit("null")).otherwise(F.lit(label)).alias("type_tag"),
        col.isNotNull().alias("present"),
        v_str.alias("v_str"),
        v_num.alias("v_num"),
        v_ts.alias("v_ts"),
    )


def _walk(prefix: str, dtype: T.DataType, col: Column, entries: list[Column]) -> None:
    entries.append(_entry(prefix, dtype, col))
    if isinstance(dtype, T.StructType):
        for f in dtype.fields:
            _walk(f"{prefix}.{f.name}", f.dataType, col.getField(f.name), entries)


def melt(
    df: DataFrame,
    json_cols: dict[str, T.StructType] | None = None,
    include: list[str] | None = None,
) -> DataFrame:
    """Melt a DataFrame into typed path rows (one output row per source row
    per dotted path). ``json_cols`` maps JSON-string column names to the
    struct schema to parse them with (the dynamic-document path, e.g.
    events.props); the raw column is reported as a ``dict`` node and its
    parsed leaves as ``col.sub`` paths — matching the reference's flatten
    rule (analyser.py:44-45).
    """
    json_cols = json_cols or {}
    # Stage every from_json parse in its OWN projection below the explode
    # (round-15 optimization, guide §4.4/§1.2 "don't compute things
    # twice"): referencing `from_json(col).sub` from each melted entry
    # re-embeds the full JSON parse into the Generate's struct array once
    # per leaf reference — 4 parses per row for a 1-field schema (isnull,
    # isnotnull, string cast, double cast), and higher-order/codegen CSE
    # does not deduplicate them inside Generate. One materialized parsed
    # column makes it exactly one parse per row (measured on the events
    # melt at sf0.1, noop sink: 1.45 s → 0.41 s, output bit-identical).
    staged = df
    parsed_ref: dict[str, Column] = {}
    for name, schema in json_cols.items():
        if include is not None and name not in include:
            continue
        if name in {f.name for f in df.schema.fields}:
            alias = f"__melt_parsed_{name}"
            staged = staged.withColumn(alias, F.from_json(F.col(name), schema))
            parsed_ref[name] = F.col(alias)
    entries: list[Column] = []
    for f in df.schema.fields:
        if include is not None and f.name not in include:
            continue
        if f.name in json_cols:
            parsed = parsed_ref[f.name]
            # node row: the JSON string column is a document; the raw JSON
            # string stands in for the reference's deep-hash of the dict
            # (analyser.py:23-30) so cardinality is observable
            entries.append(
                F.struct(
                    F.lit(f.name).alias("field"),
                    F.when(F.col(f.name).isNull(), F.lit("null"))
                    .otherwise(F.lit("dict"))
                    .alias("type_tag"),
                    F.col(f.name).isNotNull().alias("present"),
                    F.col(f.name).alias("v_str"),
                    _null("double").alias("v_num"),
                    _null("timestamp").alias("v_ts"),
                )
            )
            for sub in json_cols[f.name].fields:
                _walk(f"{f.name}.{sub.name}", sub.dataType, parsed.getField(sub.name), entries)
        else:
            _walk(f.name, f.dataType, F.col(f.name), entries)
    return staged.select(F.explode(F.array(*entries)).alias("m")).select("m.*")


def melt_array_elements(df: DataFrame, array_col: str) -> DataFrame:
    """Array-element sub-melt (reference A8, analyser.py:55-65,131-138):
    every element of ``array_col`` becomes a row under path 'col[]'.
    Stats fold over ALL elements (not just the first 10 used for schema
    election — analyser.py:94 vs :131-138).
    """
    dtype = df.schema[array_col].dataType
    if not isinstance(dtype, T.ArrayType):
        raise ValueError(f"{array_col} is not an array column")
    elem = F.explode(F.col(array_col)).alias("elem")
    elem_df = df.select(elem)
    return elem_df.select(
        _entry(f"{array_col}[]", dtype.elementType, F.col("elem")).alias("m")
    ).select("m.*")
