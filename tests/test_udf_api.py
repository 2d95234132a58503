"""Public UDF registration API (SURVEY §2.10 [EXT]): user extensions
register through Engine.register_pandas_udf / register_udf and run in
both SQL text and DataFrame code — the engine's own operators stay
UDF-free (that freedom is pinned by the absence of UDFs in every plan
pin), but the extension hook must exist for custom scorers/tokenizers."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mongo_analyser_spark.engine import Engine
from mongo_analyser_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_register_pandas_udf_in_registry_style_query(spark):
    eng = Engine(spark)

    def char_per_token(s: pd.Series) -> pd.Series:
        toks = s.str.split().str.len().clip(lower=1)
        return s.str.len() / toks

    fn = eng.register_pandas_udf("char_per_token", char_per_token, "double")

    docs = load_table(spark, SF, "documents")
    # DataFrame path: returned callable
    df_rows = (
        docs.select("doc_id", F.round(fn("text"), 3).alias("cpt"))
        .orderBy("doc_id")
        .limit(5)
        .collect()
    )
    # SQL path: registered name
    docs.createOrReplaceTempView("documents")
    sql_rows = spark.sql(
        "SELECT doc_id, ROUND(char_per_token(text), 3) AS cpt "
        "FROM documents ORDER BY doc_id LIMIT 5"
    ).collect()
    assert [tuple(r) for r in df_rows] == [tuple(r) for r in sql_rows]
    assert all(r.cpt > 0 for r in df_rows)


def test_register_pandas_udf_accepts_predecorated(spark):
    @F.pandas_udf("long")
    def doubled(v: pd.Series) -> pd.Series:
        return v * 2

    fn = Engine(spark).register_pandas_udf("doubled_ext", doubled)
    df = spark.range(3).select(fn("id").alias("x"))
    assert [r.x for r in df.collect()] == [0, 2, 4]


def test_register_row_udf_escape_hatch(spark):
    fn = Engine(spark).register_udf("shout_ext", lambda s: (s or "") + "!", "string")
    df = spark.createDataFrame([("a",), ("b",)], "s string").select(fn("s").alias("x"))
    assert {r.x for r in df.collect()} == {"a!", "b!"}
