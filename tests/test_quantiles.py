"""Bottom-k quantile sketch (operators/quantiles.py): sample membership
vs a pure-Python md5 reference, the mergeable-sketch law, type-1
quantile indexing, null handling, and the TakeOrdered plan shape."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from mongo_analyser_spark.operators.quantiles import (
    bottomk_quantile_report,
    bottomk_quantiles,
    bottomk_sample,
    merge_bottomk,
)


def _py_rank(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:13], 16)


def _df(spark, n=200):
    rows = [(i, float((i * 37) % 101)) for i in range(n)]
    return spark.createDataFrame(rows, "event_id long, value double")


def test_sample_is_true_bottomk_by_md5(spark):
    df = _df(spark)
    got = bottomk_sample(df, "event_id", 20, "value").collect()
    want = sorted(range(200), key=lambda i: (_py_rank(i), i))[:20]
    assert [r["key"] for r in got] == want
    for r in got:
        assert r["rank"] == _py_rank(r["key"])


def test_nulls_are_excluded(spark):
    rows = [(1, None), (2, 5.0), (3, None), (4, 7.0)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    got = bottomk_sample(df, "event_id", 10, "value").collect()
    assert sorted(r["v"] for r in got) == [5.0, 7.0]


def test_quantiles_are_type1_of_sample(spark):
    df = _df(spark)
    k, qs = 50, (0.1, 0.5, 0.9, 0.99)
    sample_vals = sorted(
        float((i * 37) % 101)
        for i in sorted(range(200), key=lambda i: (_py_rank(i), i))[:k]
    )
    got = {r["q"]: r["est"] for r in
           bottomk_quantiles(df, "value", "event_id", k, qs).collect()}
    for q in qs:
        idx = max(1, math.ceil(q * k))
        assert got[q] == sample_vals[idx - 1]


def test_merge_law(spark):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
    sketch-family mergeability contract."""
    df = _df(spark, 300)
    k = 25
    a = df.where(F.col("event_id") % 2 == 0)
    b = df.where(F.col("event_id") % 2 == 1)
    merged = merge_bottomk(
        [bottomk_sample(a, "event_id", k, "value"),
         bottomk_sample(b, "event_id", k, "value")],
        k,
    ).collect()
    direct = bottomk_sample(df, "event_id", k, "value").collect()
    assert [tuple(r) for r in merged] == [tuple(r) for r in direct]


def test_small_table_returns_n_below_k(spark):
    df = _df(spark, 10)
    rows = bottomk_quantiles(df, "value", "event_id", 256, (0.5,)).collect()
    assert rows[0]["n"] == 10


def test_report_error_bounds(spark):
    """est and exact_p agree within the sampling error of a k=128 sample
    on a 200-row near-uniform column, and abs_err is their rounded gap."""
    df = _df(spark)
    rep = bottomk_quantile_report(
        df, "value", "event_id", 128, (0.25, 0.5, 0.75)
    ).collect()
    for r in rep:
        assert r["abs_err"] == round(abs(r["est"] - r["exact_p"]), 4)
        assert r["abs_err"] <= 15.0  # loose; values span 0..100


def test_sketch_plans_take_ordered_not_global_sort(spark):
    from mongo_analyser_spark.plans import formatted_plan
    from mongo_analyser_spark.queries import QUERIES

    q = QUERIES["quantile_sketch_events"](spark, "/root/testdata/sf0.001")
    plan = formatted_plan(q)
    assert "TakeOrderedAndProject" in plan


def test_grouped_quantiles_match_per_group_global(spark):
    """The grouped sketch restricted to one group equals the global
    sketch run on that group's rows alone — the sharding changes the
    cut mechanics (window vs TakeOrdered), not the sample."""
    from mongo_analyser_spark.operators.quantiles import (
        grouped_bottomk_quantiles,
    )

    df = _df(spark, 200).withColumn(
        "grp", (F.col("event_id") % 3).cast("string")
    )
    got = grouped_bottomk_quantiles(
        df, "grp", "value", "event_id", 32, (0.25, 0.5, 0.75)
    ).collect()
    assert len(got) == 9
    for g in ("0", "1", "2"):
        solo = bottomk_quantiles(
            df.where(F.col("grp") == g), "value", "event_id", 32,
            (0.25, 0.5, 0.75),
        ).collect()
        mine = [r for r in got if r["grp"] == g]
        assert [(r["q"], r["est"], r["n"]) for r in mine] == [
            (r["q"], r["est"], r["n"]) for r in solo
        ]


def test_grouped_small_group_is_exact(spark):
    """A group with fewer than k present values degrades to exact
    type-1 quantiles of the whole group."""
    from mongo_analyser_spark.operators.quantiles import (
        grouped_bottomk_quantiles,
    )

    df = spark.createDataFrame(
        [(i, "only", float(v)) for i, v in enumerate([5, 1, 9, 3, 7])],
        "event_id long, grp string, value double",
    )
    rows = grouped_bottomk_quantiles(
        df, "grp", "value", "event_id", 256, (0.5, 1.0)
    ).collect()
    by_q = {r["q"]: r["est"] for r in rows}
    assert by_q[0.5] == 5.0  # ceil(0.5*5)=3rd of [1,3,5,7,9]
    assert by_q[1.0] == 9.0
