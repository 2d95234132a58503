"""BPE token math (functions/bpe.py): hand-computed truth tables for the
merge/encode loop, training determinism on a toy corpus, fixture pinning,
and exact three-way parity (Arrow mapInPandas == unrolled Column chain ==
hand encode) on the documents table."""

import json
from pathlib import Path

import pytest

from mongo_analyser_spark.functions import bpe

SF_DIR = "/root/testdata/sf0.001"


# --- pure-python truth tables --------------------------------------------


def test_merge_word_left_to_right_no_rescan():
    # "aaa" under (a,a): leftmost pair merges, no rescan of the output
    assert bpe._merge_word(tuple("aaa"), "a", "a") == ("aa", "a")
    assert bpe._merge_word(tuple("aaaa"), "a", "a") == ("aa", "aa")
    assert bpe._merge_word(tuple("abab"), "a", "b") == ("ab", "ab")
    assert bpe._merge_word(tuple("xy"), "a", "b") == ("x", "y")


def test_encode_word_rank_order():
    merges = [("a", "b"), ("ab", "c"), ("d", "e")]
    assert bpe.encode_word("abcde", merges) == ("abc", "de")
    assert bpe.encode_word("abcd", merges) == ("abc", "d")
    assert bpe.encode_word("ab", merges) == ("ab",)
    assert bpe.encode_word("ba", merges) == ("b", "a")
    assert bpe.encode_word("", merges) == ()
    # single char: no pair ever applies
    assert bpe.encode_word("a", merges) == ("a",)


def test_train_bpe_toy_corpus_deterministic(spark):
    # 'abab' x3, 'ab' x2: pair (a,b) dominates (8 occurrences), then
    # (ab,ab) appears 3 times; ties break lexicographically
    df = spark.createDataFrame(
        [("abab abab ab",), ("abab ab",)], ["text"]
    )
    merges = bpe.train_bpe(df, "text", num_merges=3)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("ab", "ab")
    # after those two merges no pair reaches min_pair_count=2:
    # words are now ('abab',) x3 and ('ab',) x2 — training stops early
    assert len(merges) == 2
    again = bpe.train_bpe(df, "text", num_merges=3)
    assert again == merges


def test_fixture_merge_table_is_what_train_produces(spark):
    """The committed table IS train_bpe's output on sf0.001 documents —
    re-derive it so fixture drift (or a regenerated testdata set that
    changes word stats) fails loudly here, not in the driver's oracle."""
    from mongo_analyser_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    merges = bpe.train_bpe(docs, "text", num_merges=64)
    assert merges == bpe.load_fixture_merges()


def test_fixture_alphabet_excludes_separators():
    for a, b in bpe.load_fixture_merges():
        assert bpe.SEP not in a + b and bpe.WORDSEP not in a + b


# --- three-way path parity ------------------------------------------------


def test_arrow_expr_and_python_paths_agree(spark):
    from pyspark.sql import functions as F

    from mongo_analyser_spark.sources.parquet import load_table

    merges = bpe.load_fixture_merges()
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    arrow = {
        r["doc_id"]: r["n_bpe"]
        for r in bpe.with_bpe_token_count(docs, "text", merges).collect()
    }
    seg = docs.select(
        "doc_id", bpe.bpe_segment_expr("text", merges).alias("seg")
    )
    expr = {
        r["doc_id"]: r["n"]
        for r in seg.select(
            "doc_id", bpe.bpe_count_from_segmented("seg").alias("n")
        ).collect()
    }
    assert arrow == expr
    # spot-check 5 docs against the pure-python encoder
    for r in docs.limit(5).collect():
        want = sum(
            len(bpe.encode_word(w, merges)) for w in r["text"].split(" ") if w
        )
        assert arrow[r["doc_id"]] == want


def test_pretokenize_word_runs():
    assert bpe.pretokenize_word("abc123def") == ["abc", "123", "def"]
    assert bpe.pretokenize_word("a1a") == ["a", "1", "a"]
    assert bpe.pretokenize_word("2024") == ["2024"]
    assert bpe.pretokenize_word("word") == ["word"]
    assert bpe.pretokenize_word("") == []
    # out-of-alphabet chars introduce NO boundary (advice r8 #2): the
    # boundary set is exactly letter<->digit, same as the SQL/Column
    # twins and train_bpe's splitter
    assert bpe.pretokenize_word("a-b") == ["a-b"]
    assert bpe.pretokenize_word("a-1b") == ["a-1", "b"]


def test_pretok_arrow_expr_and_python_paths_agree(spark):
    """pretokenize=True: Arrow stage == Column twin == direct Python on
    mixed-class words (verdict-r7 #7 — same three-way agreement contract
    as the plain mode)."""
    merges = [("a", "b"), ("1", "2"), ("ab", "c")]
    df = spark.createDataFrame(
        [(1, "abc123 ab12c"), (2, "x9y8"), (3, "abc abc123abc"), (4, "12 ab")],
        ["id", "text"],
    )
    arrow = {
        r["id"]: r["n_bpe"]
        for r in bpe.with_bpe_token_count(
            df, "text", merges, pretokenize=True
        ).collect()
    }
    seg = df.select(
        "id", bpe.bpe_segment_expr("text", merges, pretokenize=True).alias("s")
    )
    expr = {
        r["id"]: r["n"]
        for r in seg.select(
            "id", bpe.bpe_count_from_segmented("s").alias("n")
        ).collect()
    }
    want = {
        r["id"]: sum(
            len(bpe.encode_word(w, merges, pretokenize=True))
            for w in r["text"].split(" ")
            if w
        )
        for r in df.collect()
    }
    assert arrow == expr == want
    # "abc123": runs [abc][123] -> abc | 12, 3 = 3 tokens;
    # "ab12c": runs [ab][12][c] -> ab | 12 | c = 3 tokens
    assert arrow[1] == 6
    # merges never cross the class boundary: "abc123abc" -> abc|12,3|abc
    assert arrow[3] == 1 + 4


def test_train_bpe_pretokenize_never_learns_cross_class_merges(spark):
    corpus = spark.createDataFrame(
        [("ab1 ab1 ab1 ab1 cd22 cd22 cd22",)], ["text"]
    )
    plain = bpe.train_bpe(corpus, num_merges=8)
    pretok = bpe.train_bpe(corpus, num_merges=8, pretokenize=True)
    # the plain trainer happily merges across the boundary ("b"+"1")...
    assert any(
        (a + b).isalnum() and not (a + b).isalpha() and not (a + b).isdigit()
        for a, b in plain
    )
    # ...the pretokenized trainer never does: every merge output is a
    # pure letter run or a pure digit run
    for a, b in pretok:
        t = a + b
        assert t.isalpha() or t.isdigit(), (a, b)
    # and applying its table with pretokenize=True reproduces the runs
    assert bpe.encode_word("ab1", pretok, pretokenize=True) == ("ab", "1")


def test_edge_rows_empty_null_single(spark):
    merges = [("a", "b")]
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a"), (4, "ab ab"), (5, "b a")],
        ["id", "text"],
    )
    out = {
        r["id"]: r["n_bpe"]
        for r in bpe.with_bpe_token_count(df, "text", merges).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 2, 5: 2}
    # the Column twin agrees on the non-null rows (expr path returns 0 for
    # '' via empty segmented string; NULL text propagates NULL — the
    # Arrow path's 0-for-NULL is the operator contract, pinned above)
    seg = df.where("text IS NOT NULL").select(
        "id", bpe.bpe_segment_expr("text", merges).alias("s")
    )
    expr = {
        r["id"]: r["n"]
        for r in seg.select("id", bpe.bpe_count_from_segmented("s").alias("n")).collect()
    }
    assert expr == {1: 0, 3: 1, 4: 2, 5: 2}


def test_segment_expr_shape(spark):
    merges = [("a", "b"), ("c", "c")]
    df = spark.createDataFrame([("ab cc abc",)], ["text"])
    seg = df.select(bpe.bpe_segment_expr("text", merges).alias("s")).collect()[0]["s"]
    # double-boundary form: every token (including the '~' pseudo-token)
    # is wrapped in '||'; the count helper derives k = #SEP/2 - 1 - #'~'
    assert seg == "||ab||~||cc||~||ab||c||"


def test_segment_expr_suffix_collision_is_sound(spark):
    """The case the single-separator form got wrong (property-test
    find): token 'ab' ends in 'b', and the (b,b) pattern must NOT match
    across the ab|b boundary."""
    merges = [("a", "b"), ("b", "b")]
    df = spark.createDataFrame([("abb", "x")], ["text", "pad"])
    seg = df.select(bpe.bpe_segment_expr("text", merges).alias("s")).collect()[0]["s"]
    assert seg == "||ab||b||"
    out = bpe.with_bpe_token_count(df, "text", merges).collect()[0]["n_bpe"]
    assert out == 2 == len(bpe.encode_word("abb", merges))


def test_encode_tokens_match_segmented_expr(spark):
    """with_bpe_tokens' sequence == the token list reconstructed from
    the segmented Column form, and its count column == the count path."""
    from pyspark.sql import functions as F

    from mongo_analyser_spark.sources.parquet import load_table

    merges = bpe.load_fixture_merges()
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(50)
    arrow = {
        r["doc_id"]: (r["bpe_tokens"], r["n_bpe"])
        for r in bpe.with_bpe_tokens(docs, "text", merges).collect()
    }
    seg = docs.select("doc_id", bpe.bpe_segment_expr("text", merges).alias("s"))
    expr = {
        r["doc_id"]: (r["t"], r["n"])
        for r in seg.select(
            "doc_id",
            F.array_join(
                F.filter(
                    F.split("s", r"\|"),
                    lambda x: (x != bpe.WORDSEP) & (x != ""),
                ),
                " ",
            ).alias("t"),
            bpe.bpe_count_from_segmented("s").alias("n"),
        ).collect()
    }
    assert arrow == expr
    # count twin agrees with the sequence length
    for toks, n in arrow.values():
        assert n == len([t for t in toks.split(" ") if t])


def test_plan_is_arrow_batched_not_row_udf(spark):
    """The scale path must be MapInPandas (Arrow), never BatchEvalPython."""
    from mongo_analyser_spark.plans.inspect import formatted_plan
    from mongo_analyser_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    df = bpe.with_bpe_token_count(docs, "text", bpe.load_fixture_merges())
    plan = formatted_plan(df)
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
