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
