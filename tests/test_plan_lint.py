"""The 100-TB plan-safety linter: each hazard class must be detected on
a query that exhibits it and absent on the clean equivalent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_analyser_spark.plans import assert_scale_safe, lint_plan
from mongo_analyser_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def codes(findings, level=None):
    return {f.code for f in findings if level is None or f.level == level}


def test_cartesian_product_is_error(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey")
    ords = load_table(spark, SF, "orders").select("o_orderkey")
    # two sf-proportional sides with no key and no broadcast: Catalyst
    # plans a shuffle CartesianProduct once both exceed the threshold —
    # force it by disabling auto-broadcast within the lint scope
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bad = li.crossJoin(ords)
        found = lint_plan(bad)
        assert "cartesian-product" in codes(found, "error")
        with pytest.raises(ValueError, match="cartesian-product"):
            assert_scale_safe(bad)
        # the escape hatch for reviewed-and-accepted plans
        assert_scale_safe(bad, allow={"cartesian-product"})
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_row_python_udf_is_error_arrow_is_info(spark):
    docs = load_table(spark, SF, "documents")
    slow = F.udf(lambda s: len(s), "int")
    bad = docs.select(slow("text").alias("n"))
    assert "row-python-udf" in codes(lint_plan(bad), "error")

    fast = F.pandas_udf(lambda s: s.str.len(), "int")
    ok = docs.select(fast("text").alias("n"))
    found = lint_plan(ok)
    assert "row-python-udf" not in codes(found)
    assert "arrow-python" in codes(found, "info")


def test_global_sort_warns_but_take_ordered_does_not(spark):
    ev = load_table(spark, SF, "events")
    assert "global-sort" in codes(lint_plan(ev.orderBy("value")), "warning")
    topk = ev.orderBy(F.desc("value")).limit(10)
    assert "global-sort" not in codes(lint_plan(topk))


def test_clean_registry_query_has_no_errors(spark):
    """The flagship field-stats plan passes the gate it inspired."""
    from mongo_analyser_spark.queries import QUERIES

    q = QUERIES["field_stats_events"](spark, SF)
    findings = assert_scale_safe(q)  # must not raise
    assert "exchanges" in codes(findings, "info")


def test_pushdown_detection(spark):
    """A filter Catalyst can push produces no warning; one hidden behind
    an opaque expression does."""
    docs = load_table(spark, SF, "documents")
    ok = docs.filter(F.col("n_chars") > 100)
    assert "no-pushdown" not in codes(lint_plan(ok))
    opaque = docs.filter(F.md5("text") == F.lit("00"))
    assert "no-pushdown" in codes(lint_plan(opaque), "warning")


def test_subquery_limit_does_not_mask_global_sort(spark):
    """Review finding: a limit INSIDE the plan (subquery top-k) must not
    suppress the warning for an unrelated unbounded global sort above
    it."""
    ev = load_table(spark, SF, "events")
    top_users = (
        ev.groupBy("user_id")
        .count()
        .orderBy(F.desc("count"))
        .limit(5)
        .select("user_id")
    )
    joined = ev.join(top_users, "user_id").orderBy("value")  # unbounded sort
    assert "global-sort" in codes(lint_plan(joined), "warning")
