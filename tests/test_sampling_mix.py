"""Mixture sampling + token-budget selection (operators/sampling.py):
the two training-mix curation ops added in round 6."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _corpus(spark, sizes):
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "id bigint, src string")


def test_mixture_plan_upsamples_rare_sources(spark):
    """α=0.5 keeps a larger FRACTION of rare domains than dominant ones;
    dominant fraction < target_fraction < rare fraction."""
    from mongo_analyser_spark.operators.sampling import mixture_plan

    df = _corpus(spark, {"big": 900, "small": 100})
    plan = {r["src"]: r["keep_frac"] for r in mixture_plan(df, "src").collect()}
    assert plan["small"] > 0.5 > plan["big"]
    # exact closed form: f_s = 0.5·N·√n_s/Σ√n_t / n_s
    import math

    wsum = math.sqrt(900) + math.sqrt(100)
    for src, n in (("big", 900), ("small", 100)):
        expect = min(1.0, 0.5 * 1000 * math.sqrt(n) / wsum / n)
        assert plan[src] == pytest.approx(expect, abs=1e-6)


def test_mixture_sample_deterministic_and_stable(spark):
    """Same input → identical sample; a kept id stays kept when other
    strata grow (its own stratum's keep_frac unchanged)."""
    from mongo_analyser_spark.operators.sampling import mixture_sample

    df = _corpus(spark, {"a": 400, "b": 100})
    s1 = sorted(r["id"] for r in mixture_sample(df, "src", "id").collect())
    s2 = sorted(r["id"] for r in mixture_sample(df, "src", "id").collect())
    assert s1 == s2
    assert len(s1) > 0
    # hit rate lands near the plan's expectation (md5 is uniform-ish)
    assert 0.3 < len(s1) / 500 < 0.7


def test_mixture_plan_caps_at_one(spark):
    """A tiny stratum whose target exceeds its size caps at keep_frac=1
    (and the keep condition short-circuits the 9-char hex edge)."""
    from mongo_analyser_spark.operators.sampling import (
        mixture_plan,
        mixture_sample,
    )

    df = _corpus(spark, {"big": 990, "tiny": 10})
    plan = {r["src"]: r["keep_frac"] for r in mixture_plan(df, "src").collect()}
    assert plan["tiny"] == 1.0
    out = mixture_sample(df, "src", "id")
    kept_tiny = out.filter(F.col("src") == "tiny").count()
    assert kept_tiny == 10  # keep_frac=1 keeps every row


def test_mixture_plan_rejects_general_alpha(spark):
    from mongo_analyser_spark.operators.sampling import mixture_plan

    df = _corpus(spark, {"a": 10})
    with pytest.raises(ValueError, match="temperature"):
        mixture_plan(df, "src", temperature=0.7)


def test_token_budget_select_matches_naive_window(spark):
    """The two-level prefix-sum plan is EXACT: identical row set to the
    naive global running-sum formulation, including tie levels straddling
    the boundary and zero-weight rows."""
    from mongo_analyser_spark.operators.sampling import token_budget_select

    rows = []
    import random

    rng = random.Random(42)
    for i in range(500):
        # coarse scores force heavy ties; some zero weights
        rows.append((i, round(rng.random(), 1), rng.choice([0, 1, 3, 7, 20])))
    df = spark.createDataFrame(rows, "id bigint, score double, w bigint")

    got = sorted(
        (r["id"], r["score"], r["w"])
        for r in token_budget_select(df, "id", "score", "w", 1, 2).collect()
    )

    total = df.agg(F.sum("w")).collect()[0][0]
    budget = total // 2
    w = Window.orderBy(F.desc("score"), "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = sorted(
        (r["id"], r["score"], r["w"])
        for r in df.withColumn("cum", F.sum("w").over(w))
        .filter(F.col("cum") <= budget)
        .collect()
    )
    assert got == naive
    assert 0 < len(got) < 500


def test_token_budget_select_no_corpus_global_window(spark):
    """Plan pin: the only unpartitioned windows sit above the score
    histogram aggregate; the per-row window is partitioned (by the
    boundary score). No window may consume the raw scan directly."""
    from mongo_analyser_spark.queries import QUERIES

    q = QUERIES["token_budget_select_documents"](
        spark, "/root/testdata/sf0.001"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the naive formulation would run one global window straight over the
    # scan with zero aggregates; ours must histogram-aggregate first
    assert "HashAggregate" in plan
    # and the per-row boundary window must be partitioned by the score
    assert "windowspecdefinition(__score" in plan


def test_gumbel_weighted_topk_deterministic_and_weight_biased(spark):
    """Gumbel-top-k (operators/sampling.py): same salt => identical
    draw; across many salts an item with 50x the weight must be drawn
    far more often than a unit-weight item (the proportional-sampling
    property, coarse check); zero/negative weights are excluded."""
    from pyspark.sql import functions as F

    from mongo_analyser_spark.operators.sampling import gumbel_weighted_topk

    rows = [(1, 50), (2, 50), (3, 1), (4, 1), (5, 1), (6, 0)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = gumbel_weighted_topk(df, "doc_id", F.col("w"), k=2).collect()
    b = gumbel_weighted_topk(df, "doc_id", F.col("w"), k=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert all(r["doc_id"] != 6 for r in a)

    heavy_hits = light_hits = 0
    for salt in range(24):
        got = {
            r["doc_id"]
            for r in gumbel_weighted_topk(
                df, "doc_id", F.col("w"), k=2, salt=f"s{salt}"
            ).collect()
        }
        heavy_hits += len(got & {1, 2})
        light_hits += len(got & {3, 4, 5})
    assert heavy_hits > 3 * light_hits
