"""Time-series tier (operators/timeseries.py): EWMA fold semantics,
residual definition, z-score flags."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mongo_analyser_spark.operators.timeseries import (
    ewma_smooth,
    zscore_outliers,
)


def _events(spark, vals, user=1):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), user, float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_ewma_recursive_fold(spark):
    """α=0.5 recursion by hand: e1=10, e2=15, e3=27.5, e4=17.75 (k big
    enough that no element leaves the frame)."""
    df = _events(spark, [10, 20, 40, 8])
    out = {
        r["event_id"]: r
        for r in ewma_smooth(
            df, "user_id", ["ts", "event_id"], "value", k=16
        ).collect()
    }
    assert [out[i]["ewma"] for i in range(4)] == [10.0, 15.0, 27.5, 17.75]
    # residual = value - ewma(prev window); first event -> 0.0
    assert out[0]["residual"] == 0.0
    assert out[1]["residual"] == 10.0  # 20 - 10
    assert out[2]["residual"] == 25.0  # 40 - 15
    assert out[3]["residual"] == -19.5  # 8 - 27.5


def test_ewma_trailing_window_drops_old(spark):
    """k=2: the frame holds only (prev, current), so e3 restarts from
    element 2: fold(20, 40) = 30, not 27.5."""
    df = _events(spark, [10, 20, 40])
    out = {
        r["event_id"]: r["ewma"]
        for r in ewma_smooth(
            df, "user_id", ["ts", "event_id"], "value", k=2
        ).collect()
    }
    assert out[2] == 30.0


def test_ewma_partitions_by_series(spark):
    a = _events(spark, [10, 20], user=1)
    b = _events(spark, [100, 200], user=2)
    b = b.withColumn("event_id", F.col("event_id") + 10)
    out = {
        r["event_id"]: r["ewma"]
        for r in ewma_smooth(
            a.union(b), "user_id", ["ts", "event_id"], "value", k=16
        ).collect()
    }
    assert out[0] == 10.0 and out[10] == 100.0  # series don't bleed


def test_zscore_flags(spark):
    """Nine 10s and one 100: the spike's z is large positive, the rest
    mildly negative; zero-variance group emits 0.0."""
    rows = [(i, "a", 10.0) for i in range(9)] + [(9, "a", 100.0)]
    rows += [(10 + i, "b", 7.0) for i in range(3)]  # constant group
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    out = {
        r["event_id"]: r
        for r in zscore_outliers(df, "event_type", "value").collect()
    }
    assert out[9]["z_score"] == 3.0 and out[9]["is_outlier"]
    assert not out[0]["is_outlier"] and out[0]["z_score"] < 0
    assert out[10]["z_score"] == 0.0 and not out[10]["is_outlier"]
