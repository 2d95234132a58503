"""Adaptive explicit-N fanout (operators/fanout.py, round-13
verdict-r12 #4): the repartition crutch before per-row Python stages
must fire on under-parallel scans (the single-file fixture regime) and
be SKIPPED when the scan already saturates executor parallelism (the
many-file 100-TB regime, where it is an extra full shuffle of payload
bytes)."""

from __future__ import annotations

import os

from mongo_analyser_spark.operators.fanout import fanout_for_python
from mongo_analyser_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_fanout_fires_on_single_file_scan(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = fanout_for_python(docs)
    assert out.rdd.getNumPartitions() == n


def test_fanout_skipped_when_scan_saturates(spark):
    # spark.range with explicit numPartitions >= defaultParallelism
    # stands in for a many-file scan: no extra exchange should appear
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 10_000, 1, par).withColumnRenamed("id", "doc_id")
    out = fanout_for_python(df)
    assert out is df  # unchanged plan object — no shuffle added


def test_fanout_env_overrides(spark):
    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1_000, 1, par).withColumnRenamed("id", "doc_id")
    narrow = spark.range(0, 1_000, 1, 1).withColumnRenamed("id", "doc_id")
    try:
        os.environ["SPARK_GRAFT_FANOUT"] = "always"
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert fanout_for_python(wide).rdd.getNumPartitions() == n
        os.environ["SPARK_GRAFT_FANOUT"] = "never"
        assert fanout_for_python(narrow) is narrow
    finally:
        os.environ.pop("SPARK_GRAFT_FANOUT", None)


def test_fanout_preserves_rows(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    assert fanout_for_python(docs).count() == docs.count()
