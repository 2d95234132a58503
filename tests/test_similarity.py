"""Similarity search: exact cosine top-k, SRP bucketing."""

import pytest

from pyspark.sql import functions as F

from mongo_analyser_spark.operators.similarity import (
    ann_srp_topk,
    brute_force_topk,
    cosine,
    srp_bucket,
    srp_planes,
)

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),  # closest to 0
    (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal to 0
    (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
    (4, [0.5, 0.5, 0.0, 0.0]),
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_cosine_expr(spark, emb):
    pair = (
        emb.filter("vec_id = 0")
        .crossJoin(
            emb.filter("vec_id = 3").select(F.col("embedding").alias("other"))
        )
        .select(cosine(F.col("embedding"), F.col("other")).alias("c"))
        .collect()[0]["c"]
    )
    assert pair == -1.0


def test_brute_force_topk(spark, emb):
    out = brute_force_topk(emb, "vec_id", "embedding", [0], k=2).collect()
    assert [r["vid"] for r in out] == [1, 4]  # nearest first, self excluded
    assert out[0]["cos_sim"] > out[1]["cos_sim"]


def test_srp_bucket_identical_vectors_collide(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0]), (2, [-1.0, -2.0, -3.0])],
        "vec_id long, embedding array<float>",
    )
    planes = srp_planes(4, 3)
    rows = df.select("vec_id", srp_bucket(F.col("embedding"), planes).alias("b")).collect()
    buckets = {r["vec_id"]: r["b"] for r in rows}
    assert buckets[0] == buckets[1]
    assert buckets[0] != buckets[2]  # opposite vector flips every sign


def test_ann_srp_topk_runs(spark, emb):
    out = ann_srp_topk(emb, "vec_id", "embedding", [0], num_planes=2, dim=4, k=3)
    rows = out.collect()
    assert all(r["qid"] == 0 and r["vid"] != 0 for r in rows)
