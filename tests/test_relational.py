"""Relational composite operators: as-of join, top-k per group."""

import datetime as dt

from pyspark.sql import functions as F

from mongo_analyser_spark.operators.relational import asof_join, top_k_per_group


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_join_basic(spark):
    quotes = spark.createDataFrame(
        [("A", ts(9), 10.0), ("A", ts(11), 11.0), ("B", ts(10), 20.0)],
        "sym string, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [("A", ts(10)), ("A", ts(12)), ("A", ts(8)), ("B", ts(10))],
        "sym string, tts timestamp",
    )
    out = asof_join(trades, quotes, "sym", "tts", "qts", "px", "last_px")
    got = {(r["sym"], r["tts"].hour): r["last_px"] for r in out.collect()}
    assert got[("A", 10)] == 10.0  # most recent quote at/before 10:00
    assert got[("A", 12)] == 11.0
    assert got[("A", 8)] is None  # nothing before 08:00
    assert got[("B", 10)] == 20.0  # simultaneous right row IS visible


def test_top_k_per_group_ties_deterministic(spark):
    df = spark.createDataFrame(
        [("g", "a", 5), ("g", "b", 5), ("g", "c", 4), ("h", "z", 1)],
        "grp string, val string, cnt long",
    )
    out = top_k_per_group(df, ["grp"], [F.desc("cnt"), F.asc("val")], 2).collect()
    got = {(r["grp"], r["rnk"]): r["val"] for r in out}
    assert got[("g", 1)] == "a"  # tie broken by value ASC
    assert got[("g", 2)] == "b"
    assert got[("h", 1)] == "z"


def test_salted_join_matches_plain_join(spark):
    from mongo_analyser_spark.operators.relational import salted_join
    from mongo_analyser_spark.sources.parquet import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    cust = load_table(spark, "/root/testdata/sf0.001", "customer")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name"
    )
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "k"),
        cust.withColumnRenamed("c_custkey", "k"),
        "k",
        buckets=8,
    ).select("o_orderkey", "c_name")
    assert salted.count() == plain.count()
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_salted_join_left_keeps_unmatched(spark):
    from mongo_analyser_spark.operators.relational import salted_join

    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], "k int, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    out = salted_join(big, dim, "k", buckets=4, how="left").collect()
    assert len(out) == 3
    assert {r["k"]: r["w"] for r in out} == {1: "x", 2: "y", 99: None}


def test_salted_join_rejects_right():
    import pytest as _pytest
    from mongo_analyser_spark.operators.relational import salted_join

    with _pytest.raises(ValueError):
        salted_join(None, None, "k", how="right")


def test_asof_join_equal_ts_tiebreak_deterministic(spark):
    """Several right rows sharing (key, right_ts): the window's trailing
    __rv order makes the MAX value win, independent of partition-internal
    row order (ADVICE round-1: nondeterministic fold)."""
    from mongo_analyser_spark.operators.relational import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, lts long")
    for attempt in range(2):
        rows = [(1, 5, 100.0), (1, 5, 300.0), (1, 5, 200.0)]
        if attempt:  # insertion order must not matter
            rows = rows[::-1]
        right = spark.createDataFrame(rows, "k long, rts long, val double")
        out = asof_join(left, right, "k", "lts", "rts", "val", "asof_val").collect()
        assert [r.asof_val for r in out] == [300.0]


def test_salted_join_salt_is_content_derived_and_reproducible(spark):
    """Round-2 verdict #7: the salt must be a content hash, not F.rand —
    identical bucket assignment across independent evaluations and
    partition layouts."""
    from pyspark.sql import functions as F

    from mongo_analyser_spark.operators.relational import salted_join

    big = spark.range(0, 2000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("row_id")
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, name string")
    out1 = sorted(tuple(r) for r in salted_join(big, dim, "k", buckets=8).collect())
    out2 = sorted(
        tuple(r)
        for r in salted_join(big.repartition(13), dim, "k", buckets=8).collect()
    )
    assert out1 == out2
    # the internal salt itself is deterministic: recompute it twice
    salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64("k", "row_id", F.lit(42)), F.lit(8)).cast("int")
    )
    a = {(r["row_id"], r["__salt"]) for r in salted.collect()}
    b = {(r["row_id"], r["__salt"]) for r in salted.repartition(7).collect()}
    assert a == b
    # and the hot key really spreads across buckets
    n_buckets = salted.filter(F.col("k") == 0).select("__salt").distinct().count()
    assert n_buckets == 8
