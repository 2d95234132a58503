"""Sparse TF-IDF tier (operators/tfidf.py): weight math against a
pure-Python reference, prefix-blocking semantics, and the recall-report
contract. The registry twins are hash-oracled against DuckDB at two
scales; these pin the algebra on a corpus small enough to verify by
hand."""

from __future__ import annotations

import math

from mongo_analyser_spark.operators.tfidf import (
    prefix_candidates,
    tfidf_cosine_pairs,
    tfidf_exact_pairs,
    tfidf_pairs_recall_report,
    tfidf_postings,
    tfidf_topk_terms,
)

DOCS = [
    (1, "spark shuffle join join"),
    (2, "spark shuffle join scan"),
    (3, "pandas arrow batch"),
    (4, "pandas arrow batch batch"),
    (5, "spark rare"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_weights() -> dict[tuple[int, str], float]:
    n = len(DOCS)
    tf: dict[tuple[int, str], int] = {}
    for i, t in DOCS:
        for w in t.split():
            tf[(i, w)] = tf.get((i, w), 0) + 1
    df: dict[str, int] = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    return {
        (i, w): c * (math.log(n + 1) - math.log(df[w] + 1))
        for (i, w), c in tf.items()
    }


def test_postings_match_python_reference(spark):
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["w"])
        for r in tfidf_postings(_df(spark)).collect()
    }
    want = _py_weights()
    assert set(got) == set(want)
    for key, w in want.items():
        assert abs(got[key][2] - w) < 1e-12


def test_topk_ranks_on_rounded_weight_with_term_tiebreak(spark):
    rows = tfidf_topk_terms(_df(spark), k=2).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 5: "rare" (df=1) outweighs "spark" (df=3) at equal tf
    d5 = [r["term"] for r in by_doc[5]]
    assert d5 == ["rare", "spark"]
    for rs in by_doc.values():
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))


def test_prefix_candidates_share_a_rarest_term(spark):
    post = tfidf_postings(_df(spark))
    cand = {
        (r["id_a"], r["id_b"])
        for r in prefix_candidates(post, "doc_id", prefix=2).collect()
    }
    # every candidate ordered, no self-pairs
    assert all(a < b for a, b in cand)
    # docs 3/4 share their two rarest terms; 1/2 share theirs
    assert (3, 4) in cand and (1, 2) in cand


def test_pairs_are_verified_subset_of_exact(spark):
    df = _df(spark)
    found = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, threshold=0.1, prefix=1).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_exact_pairs(df, threshold=0.1).collect()
    }
    assert set(found) <= set(exact)
    for k, v in found.items():
        assert v == exact[k]  # verification IS the exact cosine
    # near-identical docs land near 1.0
    assert exact[(3, 4)] > 0.9


def test_recall_report_contract(spark):
    [r] = tfidf_pairs_recall_report(
        _df(spark), threshold=0.1, prefix=1
    ).collect()
    # verification exact => found is a subset of truth and matched==found
    assert r["found_pairs"] == r["matched"] <= r["true_pairs"]
    assert 0.0 <= r["recall"] <= 1.0
    # prefix=2 on this 8-term corpus blocks perfectly
    [r2] = tfidf_pairs_recall_report(
        _df(spark), threshold=0.3, prefix=2
    ).collect()
    assert r2["recall"] == 1.0


def test_empty_and_degenerate_corpora(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert tfidf_topk_terms(empty).collect() == []
    [r] = tfidf_pairs_recall_report(empty).collect()
    assert r["true_pairs"] == 0 and r["recall"] == 1.0
    solo = spark.createDataFrame([(1, "only one doc")], "doc_id long, text string")
    assert tfidf_cosine_pairs(solo, threshold=0.0).collect() == []


def test_full_prefix_blocking_is_complete_on_random_corpus(spark):
    """Randomized completeness: with prefix >= every doc's vocabulary
    size, every exact pair shares a prefix term by construction, so the
    blocked join must equal the exact join EXACTLY (ids and cosines) —
    over a seeded random corpus far messier than the fixtures."""
    import random

    rng = random.Random(99)
    words = ["w%d" % i for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(3, 12))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_exact_pairs(df, threshold=0.5).collect()
    }
    found = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, threshold=0.5, prefix=12).collect()
    }
    assert found == exact and len(exact) > 0
