"""Sequence packing: two-level prefix sum equivalence and semantics."""

from pyspark.sql import functions as F

from mongo_analyser_spark.functions.text import token_count
from mongo_analyser_spark.operators.packing import pack_sequences


def test_pack_sequences_semantics(spark):
    rows = [(1, "a b c"), (2, "d e"), (3, "f g h i"), (10, "j")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           pack_sequences(df, "doc_id", token_count("text"), seq_len=4).collect()}
    # stream: doc1 tokens 0-2, doc2 3-4, doc3 5-8, doc10 9
    assert (out[1].start_off, out[1].seq_id, out[1].seq_offset) == (0, 0, 0)
    assert (out[2].start_off, out[2].seq_id, out[2].seq_offset) == (3, 0, 3)
    assert (out[3].start_off, out[3].seq_id, out[3].seq_offset) == (5, 1, 1)
    assert (out[10].start_off, out[10].seq_id, out[10].seq_offset) == (9, 2, 1)


def test_pack_sequences_group_width_invariant(spark):
    rows = [(i, "w " * (i % 7 + 1)) for i in range(1, 200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple,
        pack_sequences(df, "doc_id", token_count("text"), 16, group_width=5).collect()))
    b = sorted(map(tuple,
        pack_sequences(df, "doc_id", token_count("text"), 16, group_width=10**9).collect()))
    assert a == b


def test_pack_sequences_validates_params(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", token_count("text"), 0)
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", token_count("text"), 4, group_width=0)
