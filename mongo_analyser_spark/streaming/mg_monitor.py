"""Streaming Misra-Gries heavy-hitter monitor (ST14 [EXT], round 13 —
verdict-r11 #7 / verdict-r12 #5): the mergeable MG summary
(operators/heavyhitters.py) as a continuously-updating stateful
streaming operator, closing the last sketch family without a streaming
twin (field-stats ST7, tokens ST8, HLL ST9, count-min ST10, schema
ST11, bottom-k quantiles ST12, theta ST13).

Determinism contract (the batch operator's, inherited): the mergeable
MG formulation is a pure function of the EXACT per-key counts —
"subtract the (k+1)-th largest count, keep the positive remainders"
(Agarwal et al., Mergeable Summaries, PODS 2012; merge law pinned in
tests/test_heavyhitters.py). The state is therefore the shard's exact
counts, updated additively per micro-batch (addition is commutative —
order- and partition-independent), and the emitted rows are the shard's
compression of those exact counts: after ANY stream prefix the emitted
summary rows equal batch ``mg_summary`` over the same rows EXACTLY, and
feeding them to the SAME ``mg_merge`` yields the batch
``mg_heavy_hitters`` report bit-for-bit (pytest-pinned including a
stop/append/restart boundary).

Scale honesty (what is and is not bounded): the per-shard state is the
shard's exact key counts — the state any keyed streaming COUNT
aggregate holds, sharded G ways; it grows with key cardinality, not
stream length. What MG bounds is everything DOWNSTREAM: at most k rows
per shard leave the monitor per refresh, so the output table, the final
merge, and any cross-cluster summary exchange are O(G·k) regardless of
cardinality. For hard-bounded state with OVERestimates use ST10's
count-min; MG is the guaranteed-UNDERestimate side of the bracket, and
its price is the exact-count store. A truly O(k)-state streaming MG
exists (classic one-pass update) but is stream-ORDER-dependent, which
would break the exact stream==batch contract every other monitor in
this family keeps.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mongo_analyser_spark.operators.dsir import md5_bucket

OUTPUT_SCHEMA = (
    "g long, key string, exact_cnt long, t_g long, weight long, seq long"
)
STATE_SCHEMA = "ks array<string>, cnts array<bigint>, seq bigint"


def _compress(counts: dict, k: int) -> list[tuple]:
    """The per-shard MG compression of exact counts — the Python twin of
    ``mg_summary``'s SQL (sort by count desc, key asc; t_g = the
    (k+1)-th largest count or 0; keep the top k with positive
    remainders). Integer algebra only."""
    ranked = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
    t_g = ranked[k][1] if len(ranked) > k else 0
    out = []
    for key, cnt in ranked[:k]:
        w = cnt - t_g
        if w > 0:
            out.append((key, cnt, t_g, w))
    return out


def _make_update(k: int) -> callable:
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ks, cnts, seq = state.get
            counts = dict(zip(ks, (int(c) for c in cnts)))
        else:
            counts, seq = {}, 0
        for pdf in pdfs:
            for kx, c in pdf["key"].astype(str).value_counts().items():
                counts[kx] = counts.get(kx, 0) + int(c)
        seq += 1
        items = sorted(counts.items())
        state.update(([t[0] for t in items], [t[1] for t in items], seq))
        g = int(key[0])
        rows = [
            {"g": g, "key": kx, "exact_cnt": cnt, "t_g": t_g,
             "weight": w, "seq": seq}
            for kx, cnt, t_g, w in _compress(counts, k)
        ]
        yield pd.DataFrame(
            rows,
            columns=["g", "key", "exact_cnt", "t_g", "weight", "seq"],
        )

    return update


def mg_stream(
    sdf: DataFrame,
    key: Column,
    k: int = 16,
    n_groups: int = 8,
) -> DataFrame:
    """Streaming per-shard MG summary: (g, key, exact_cnt, t_g, weight,
    seq), at most ``k`` rows per shard per micro-batch, ``seq`` monotone
    per shard. Write with ``.writeStream.outputMode("update")``; read
    the freshest summary by max(seq) per shard and feed it to
    ``operators.heavyhitters.mg_merge`` for the certified final-k
    report. Batch twin: ``mg_summary`` — exact row equality after any
    stream prefix is the ST14 contract (tests/test_streaming.py).

    Rows reach the stateful operator raw (one per event, one hash
    shuffle on the shard id — a pre-shuffle streaming COUNT aggregate
    would emit CUMULATIVE counts every refresh and double-count here);
    the per-batch counting is a vectorized pandas value_counts inside
    the update."""
    staged = sdf.select(key.cast("string").alias("key")).withColumn(
        "g", md5_bucket(F.concat(F.lit("mg:"), F.col("key")), n_groups)
    )
    return staged.groupBy("g").applyInPandasWithState(
        _make_update(k),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
