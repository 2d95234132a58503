"""Corpus-statistical quality scoring (training-data curation tier).

Reference parity: extends the reference's per-field value statistics
(mongo_analyser/core/analyser.py value-frequency guards) to corpus-level
language-model statistics — the cheap CCNet-style quality signal a
pretraining pipeline runs before any expensive model pass.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mongo_analyser_spark.functions.text import tokens


def unigram_nll(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: Callable[[Column], Column] = tokens,
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    unigram distribution: (id, n_tokens, avg_nll). High avg_nll =
    rare-token-heavy documents (gibberish, IDs, boilerplate noise);
    low = stopword-heavy prose.

    Token NLL = ln(total) - ln(cnt) over exact integer counts, so both
    log operands are engine-independent; the final ROUND absorbs only
    per-document float summation order. Plan shape (scale notes in the
    registered query's docstring): explode → vocab groupBy (map-side
    partial absorbs the Zipf head) → token-keyed re-join → per-doc
    regroup. No OOV when a corpus scores itself; to score corpus B
    under corpus A's model, add-one smooth: ln(total + V) - ln(cnt + 1)
    with absent counts as 0.
    """
    toks = docs.select(id_col, F.explode(tokenizer(F.col(text_col))).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(
                    F.log(F.col("total").cast("double"))
                    - F.log(F.col("cnt").cast("double"))
                ),
                round_to,
            ).alias("avg_nll"),
        )
    )
