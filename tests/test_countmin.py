"""Count-min sketch (operators/countmin.py): cell math vs a pure-Python
reference, the overestimate guarantee, mergeability, and the error
bound's order of magnitude."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from mongo_analyser_spark.operators.countmin import (
    countmin_estimates,
    countmin_sketch,
)

D, W = 3, 16

KEYS = ["a", "b", "c", "d", "e", "f", "g", "h"]
ROWS = [(k,) for k in KEYS for _ in range(KEYS.index(k) + 1)]  # a×1 .. h×8


def _df(spark):
    return spark.createDataFrame(ROWS, "k string")


def _py_bucket(k: str, r: int) -> int:
    h = hashlib.md5(f"cm{r}:{k}".encode()).hexdigest()[:13]
    return int(h, 16) % W


def _py_sketch() -> dict[tuple[int, int], int]:
    cells: dict[tuple[int, int], int] = {}
    for (k,) in ROWS:
        for r in range(D):
            cell = (r, _py_bucket(k, r))
            cells[cell] = cells.get(cell, 0) + 1
    return cells


def test_sketch_cells_match_python_reference(spark):
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in countmin_sketch(_df(spark), F.col("k"), D, W).collect()
    }
    assert got == _py_sketch()


def test_estimates_overestimate_and_match_python_min(spark):
    est = countmin_estimates(_df(spark), F.col("k"), "k", D, W).collect()
    cells = _py_sketch()
    exact = {k: KEYS.index(k) + 1 for k in KEYS}
    assert len(est) == len(KEYS)
    for r in est:
        want = min(cells[(d, _py_bucket(r["k"], d))] for d in range(D))
        assert r["cm_est"] == want
        assert r["exact_cnt"] == exact[r["k"]]
        assert r["overestimate"] == want - exact[r["k"]] >= 0


def test_sketch_is_mergeable(spark):
    """Cell-wise sum of two half-corpus sketches == the full-corpus
    sketch — the property that lets 1000 executors ship bounded
    partials instead of re-shuffling the corpus."""
    df = _df(spark)
    # deterministic split by parity of a row number
    from pyspark.sql import Window

    w = Window.orderBy("k")
    numbered = df.withColumn("rn", F.row_number().over(w))
    a = numbered.where(F.col("rn") % 2 == 0).select("k")
    b = numbered.where(F.col("rn") % 2 == 1).select("k")
    merged = (
        countmin_sketch(a, F.col("k"), D, W)
        .unionAll(countmin_sketch(b, F.col("k"), D, W))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    got = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    full = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in countmin_sketch(df, F.col("k"), D, W).collect()
    }
    assert got == full


def test_error_bound_order_of_magnitude(spark):
    """Each overestimate is bounded by eN/w with probability
    1-(1/e)^d per key; assert the classical bound times a slack factor
    holds for EVERY key on this fixed corpus (deterministic here — no
    randomness at fixed hashes)."""
    est = countmin_estimates(_df(spark), F.col("k"), "k", D, W).collect()
    n = len(ROWS)
    bound = math.e * n / W
    for r in est:
        assert r["overestimate"] <= 3 * bound
