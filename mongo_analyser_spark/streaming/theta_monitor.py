"""Streaming theta/KMV distinct monitor (ST13 [EXT]) — the theta sketch
(operators/theta.py) as a continuously-updating stateful streaming
operator: per-group distinct-count estimates with the EXACT-determinism
contract the HLL dedup monitor (ST9) cannot offer.

ST9's approx_count_distinct answers the same monitoring question with
engine-internal HLL partials; this monitor's state is the KMV bottom-k
of distinct md5 ranks — a pure function of the data — so after any
stream prefix the (n_sketch, theta, est_distinct) row EQUALS the batch
``theta_sketches`` over the same rows exactly, and the emitted sketch
state could be handed to the batch set-algebra operators
(union/intersection/Jaccard/difference) unchanged.

The update is the same mergeable-bottom-k law as ST12's quantile
monitor (bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)), pinned
in tests/test_quantiles.py), applied to DISTINCT ranks: per micro-batch,
set-union the batch's ranks into the ≤ k-element state and re-cut.

Quantization parity: the batch operator emits
``F.round((k-1)·2^52/theta, 6)`` — Spark ROUND is BigDecimal HALF_UP
over the double's shortest decimal repr, replicated here with Python's
``Decimal(repr(x)).quantize(1e-6, ROUND_HALF_UP)`` (repr and
Double.toString both produce the shortest round-trip form).

Scale notes: state is ≤ k longs per group; per-batch work is
O((k + batch) log(k + batch)) per group after an in-Python set-dedupe;
output one row per group per batch with a monotone ``seq``.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mongo_analyser_spark.operators.quantiles import md5_rank
from mongo_analyser_spark.operators.theta import TWO52

OUTPUT_SCHEMA = (
    "group string, n_sketch long, theta long, est_distinct double,"
    " seq long"
)
STATE_SCHEMA = "hs array<bigint>, seq bigint"


def _round6_like_spark(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _make_update(k: int) -> callable:
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hs, seq = state.get
            seen = set(hs)
        else:
            seen, seq = set(), 0
        for pdf in pdfs:
            seen.update(int(h) for h in pdf["h"])
        hs = sorted(seen)[:k]
        seq += 1
        state.update((hs, seq))
        n = len(hs)
        if n >= k:
            theta = hs[k - 1]
            est = _round6_like_spark((k - 1) * TWO52 / theta)
        else:
            theta = TWO52
            est = float(n)
        yield pd.DataFrame(
            [
                {
                    "group": key[0],
                    "n_sketch": n,
                    "theta": theta,
                    "est_distinct": est,
                    "seq": seq,
                }
            ]
        )

    return update


def theta_distinct_stream(
    sdf: DataFrame, group: Column, item: Column, k: int = 128
) -> DataFrame:
    """Streaming per-group KMV distinct estimate:
    (group, n_sketch, theta, est_distinct, seq). Write with
    ``.writeStream.outputMode("update")``; read the freshest row by
    max(seq) per group. Batch twin: operators/theta.theta_sketches —
    exact equality after any stream prefix is the ST13 contract."""
    staged = sdf.select(
        group.cast("string").alias("__g"), md5_rank(item).alias("h")
    )
    return staged.groupBy("__g").applyInPandasWithState(
        _make_update(k),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
