"""Streaming bottom-k quantile monitor (ST12 [EXT]) — the bottom-k
quantile sketch (operators/quantiles.py) as a continuously-updating
stateful streaming operator, completing the streaming twin set for the
sketch family (field-stats ST7, tokens ST8, dedup-health HLL ST9,
count-min ST10, live schema ST11).

Why stateful instead of a plain streaming aggregate: the bottom-k cut
is an order statistic, not an additive counter — Spark's streaming
aggregates can hold one row per GROUP, not "the k smallest rows seen so
far". The mergeable-sketch law (bottom-k(A ∪ B) == bottom-k(bottom-k(A)
∪ bottom-k(B)), pinned in tests/test_quantiles.py) makes the exact
fixed-size state update trivial: per micro-batch, union the batch's
(rank, key, value) rows into the ≤ k-row state and re-cut. That is
precisely what ``applyInPandasWithState`` exists for (the
running_user_totals shape, streaming/stateful.py) — keyed state, Arrow
batches, update output mode.

Determinism contract (the batch sketch's, inherited): ranks are exact
md5 52-bit integers, membership is a pure function of the data, and the
emitted estimates are RAW data values indexed by ceil(q·n) — so after
any prefix of the stream the monitor's report equals the batch
``grouped_bottomk_quantiles`` over the same rows EXACTLY (pytest-pinned
including a stop/append/restart boundary). The one theoretical
divergence: cross-key ties in the 52-bit rank sort compare the key as a
STRING here vs natively in the batch cut — probability ~n²/2⁵², absent
at any tested scale and harmless to the estimate (tied ranks mean equal
sample membership candidates).

Scale notes: state is ≤ k (rank, key, value) triples PER GROUP —
independent of stream length; each micro-batch ships its rows once
through one hash shuffle on the group key; the per-batch Python work is
O((k + batch) log(k + batch)) per group. Output: one row per (group, q)
per batch with a monotone ``seq`` so downstream readers (and the
restart-parity test) can select the freshest report per group.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mongo_analyser_spark.operators.quantiles import DEFAULT_QS, md5_rank

OUTPUT_SCHEMA = (
    "group string, q double, est double, n_sample long, seq long"
)
STATE_SCHEMA = (
    "ranks array<bigint>, keys array<string>, vs array<double>, seq bigint"
)


def _make_update(k: int, qs) -> callable:
    qs = [float(q) for q in qs]

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ranks, keys, vs, seq = state.get
            items = list(zip(ranks, keys, vs))
        else:
            items, seq = [], 0
        for pdf in pdfs:
            items.extend(
                zip(
                    (int(r) for r in pdf["rank"]),
                    (str(x) for x in pdf["key"]),
                    (float(v) for v in pdf["v"]),
                )
            )
        items.sort(key=lambda t: (t[0], t[1]))
        items = items[:k]
        seq += 1
        state.update(
            (
                [t[0] for t in items],
                [t[1] for t in items],
                [t[2] for t in items],
                seq,
            )
        )
        n = len(items)
        svs = sorted(t[2] for t in items)
        rows = [
            {
                "group": key[0],
                "q": q,
                # type-1 lower quantile: element ceil(q*n), 1-based,
                # clamped — the _quantiles_from_sample arithmetic
                "est": svs[max(1, math.ceil(q * n)) - 1] if n else None,
                "n_sample": n,
                "seq": seq,
            }
            for q in qs
        ]
        yield pd.DataFrame(rows)

    return update


def bottomk_quantile_stream(
    sdf: DataFrame,
    group: Column,
    value: Column,
    key: Column,
    k: int = 256,
    qs=DEFAULT_QS,
) -> DataFrame:
    """Streaming per-group bottom-k quantile report:
    (group, q, est, n_sample, seq), one batch of rows per group per
    micro-batch, ``seq`` monotone per group. Write with
    ``.writeStream.outputMode("update")``; read the freshest report by
    max(seq) per group. Batch twin:
    operators/quantiles.grouped_bottomk_quantiles — equality after any
    stream prefix is the ST12 contract (tests/test_streaming.py)."""
    staged = sdf.where(value.isNotNull()).select(
        group.cast("string").alias("__g"),
        md5_rank(key).alias("rank"),
        key.cast("string").alias("key"),
        value.cast("double").alias("v"),
    )
    return staged.groupBy("__g").applyInPandasWithState(
        _make_update(k, qs),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
