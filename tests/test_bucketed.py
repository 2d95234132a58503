"""Bucketed sink: the co-located-join scale path — a join between two
tables bucketed on the same key must read pre-shuffled buckets and plan
with ZERO Exchange."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from mongo_analyser_spark.plans import formatted_plan, num_exchanges
from mongo_analyser_spark.sinks.bucketed import drop_bucketed, write_bucketed
from mongo_analyser_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


@contextmanager
def _no_broadcast(spark):
    """Force the shuffle-join planner so the assertion targets bucketing,
    not AQE's small-table broadcast shortcut."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    try:
        bo = write_bucketed(
            orders, "orders_b", ["o_custkey"], 4, path=str(tmp_path / "o")
        )
        bc = write_bucketed(
            customer.withColumnRenamed("c_custkey", "o_custkey"),
            "customer_b", ["o_custkey"], 4, path=str(tmp_path / "c"),
        )
        with _no_broadcast(spark):
            joined = bo.join(bc, "o_custkey").select(
                "o_custkey", "o_totalprice", "c_name"
            )
            plan = formatted_plan(joined)
            assert "SortMergeJoin" in plan
            assert num_exchanges(joined) == 0, plan
            # same data as the plain (shuffling) join
            plain = orders.join(
                customer, orders.o_custkey == customer.c_custkey
            ).count()
            assert joined.count() == plain
    finally:
        drop_bucketed(spark, "orders_b")
        drop_bucketed(spark, "customer_b")


def test_bucketed_groupby_has_no_exchange(spark, tmp_path):
    """Aggregation on the bucket key also reads pre-shuffled input."""
    orders = load_table(spark, SF, "orders")
    try:
        bo = write_bucketed(
            orders, "orders_b2", ["o_custkey"], 4, path=str(tmp_path / "o2")
        )
        agg = bo.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
        assert num_exchanges(agg) == 0, formatted_plan(agg)
        assert agg.count() == orders.select("o_custkey").distinct().count()
    finally:
        drop_bucketed(spark, "orders_b2")


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, tmp_path):
    """A mismatched side degrades to a normal shuffle join — documents
    the both-sides-same-count contract instead of corrupting results."""
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    try:
        bo = write_bucketed(
            orders, "orders_b3", ["o_custkey"], 4, path=str(tmp_path / "o3")
        )
        bc = write_bucketed(
            customer.withColumnRenamed("c_custkey", "o_custkey"),
            "customer_b3", ["o_custkey"], 8, path=str(tmp_path / "c3"),
        )
        with _no_broadcast(spark):
            joined = bo.join(bc, "o_custkey")
            assert num_exchanges(joined) >= 1
            assert joined.count() > 0
    finally:
        drop_bucketed(spark, "orders_b3")
        drop_bucketed(spark, "customer_b3")
