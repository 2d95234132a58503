"""Theta/KMV set-algebra sketches (operators/theta.py): sketch content
vs a pure-Python md5 reference, exact-vs-estimation mode, the pairwise
estimators, and the bottom-k merge law."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mongo_analyser_spark.operators.theta import (
    TWO52,
    theta_overlap_report,
    theta_pair_overlap,
    theta_sketches,
)


def _rank(item) -> int:
    return int(hashlib.md5(str(item).encode()).hexdigest()[:13], 16)


def _df(spark):
    # group A: items 0..199; group B: 100..299 (overlap 100..199);
    # group C: tiny (exact mode at k=32)
    rows = (
        [("A", f"it{i}") for i in range(200)]
        + [("B", f"it{i}") for i in range(100, 300)]
        + [("C", f"it{i}") for i in range(10)]
    )
    return spark.createDataFrame(rows, "src string, it string")


def test_sketch_is_bottomk_of_distinct_ranks(spark):
    df = _df(spark)
    got = {
        r["group"]: (list(r["hs"]), r["theta"], r["n_sketch"], r["est_distinct"])
        for r in theta_sketches(df, "src", F.col("it"), 32).collect()
    }
    for grp, items in [
        ("A", range(200)), ("B", range(100, 300)), ("C", range(10))
    ]:
        ranks = sorted(_rank(f"it{i}") for i in items)[:32]
        hs, theta, n, est = got[grp]
        assert hs == ranks
        if len(ranks) >= 32:
            assert theta == ranks[31]
            assert est == round(31 * TWO52 / ranks[31], 6)
        else:
            assert theta == TWO52
            assert est == float(len(ranks))
    # exact mode estimate IS the count
    assert got["C"][3] == 10.0


def test_pair_overlap_matches_python_estimators(spark):
    df = _df(spark)
    k = 32
    sk = theta_sketches(df, "src", F.col("it"), k)
    got = {
        (r["group_a"], r["group_b"]): r
        for r in theta_pair_overlap(sk, k).collect()
    }
    ranks = {
        g: sorted(_rank(f"it{i}") for i in items)
        for g, items in [
            ("A", range(200)), ("B", range(100, 300)), ("C", range(10))
        ]
    }
    for ga, gb in [("A", "B"), ("A", "C"), ("B", "C")]:
        ha, hb = ranks[ga][:k], ranks[gb][:k]
        ta = ha[k - 1] if len(ha) >= k else TWO52
        tb = hb[k - 1] if len(hb) >= k else TWO52
        th = min(ta, tb)
        sa = [h for h in ha if h < th]
        sb = [h for h in hb if h < th]
        common = len(set(sa) & set(sb))
        union = len(set(sa) | set(sb))
        r = got[(ga, gb)]
        assert r["n_common"] == common and r["n_union"] == union
        assert r["est_inter"] == round(common * TWO52 / th, 6)
        assert r["est_union"] == round(union * TWO52 / th, 6)
        assert r["est_jaccard"] == (
            round(common / union, 6) if union else None
        )


def test_exact_mode_pair_is_exact(spark):
    """Two below-capacity groups: theta = 2^52 on both sides, so the
    'estimates' degrade gracefully to the exact set counts."""
    rows = [("X", f"a{i}") for i in range(20)] + [
        ("Y", f"a{i}") for i in range(10, 40)
    ]
    df = spark.createDataFrame(rows, "src string, it string")
    [r] = theta_pair_overlap(
        theta_sketches(df, "src", F.col("it"), 64), 64
    ).collect()
    assert r["n_common"] == 10 and r["n_union"] == 40
    assert r["est_inter"] == 10.0 and r["est_union"] == 40.0
    assert r["est_jaccard"] == 0.25


def test_merge_law_bottomk_of_sketch_union(spark):
    """sketch(A ∪ B) == bottom-k over the union of the two sketches'
    rank sets — the mergeable-sketch law."""
    df = _df(spark)
    k = 32
    sk = {
        r["group"]: list(r["hs"])
        for r in theta_sketches(df, "src", F.col("it"), k).collect()
    }
    ab = df.where(F.col("src").isin("A", "B")).withColumn(
        "src", F.lit("AB")
    )
    [merged] = theta_sketches(ab, "src", F.col("it"), k).collect()
    assert list(merged["hs"]) == sorted(set(sk["A"]) | set(sk["B"]))[:k]


def test_report_err_is_est_minus_exact(spark):
    df = _df(spark)
    rep = theta_overlap_report(df, "src", F.col("it"), 32).collect()
    for r in rep:
        assert r["err"] == round(r["est_inter"] - r["exact_inter"], 6)
    by = {(r["group_a"], r["group_b"]): r for r in rep}
    assert by[("A", "B")]["exact_inter"] == 100
    assert by[("A", "C")]["exact_inter"] == 10


def test_difference_estimates_and_certification(spark):
    """A={1..60}, B={41..100}: exact |A\\B| = 40, |B\\A| = 40; below
    capacity the sketch is the whole set, so estimates are EXACT and
    the errors zero."""
    from pyspark.sql import functions as F

    from mongo_analyser_spark.operators.theta import theta_difference_report

    rows = [("a", str(i)) for i in range(1, 61)] + [
        ("b", str(i)) for i in range(41, 101)
    ]
    df = spark.createDataFrame(rows, "grp string, it string")
    out = theta_difference_report(
        df, "grp", F.col("it"), k=256
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["exact_a_only"], r["exact_b_only"]) == (40, 40)
    assert r["est_a_only"] == 40.0 and r["est_b_only"] == 40.0
    assert r["err_a"] == 0.0 and r["err_b"] == 0.0
