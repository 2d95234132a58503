"""Adaptive explicit-N fanout for per-row-expensive Python stages
(round-13, verdict-r12 #4 — the many-FILE axis).

The explicit-N repartition before every codec/text mapInPandas stage
exists because the TOY fixtures are single-file parquet: the scan gives
ONE partition and the Python stage serializes (round-9 char_entropy ran
17.1 s single-task vs 1.7 s fanned out; plans/lint.py pins the pattern).
But the repartition was UNCONDITIONAL — and at a real 100-TB layout the
scan parallelism is the file/split count (thousands), where the same
repartition is an EXTRA full shuffle of the payload bytes for zero
parallelism gain.

``fanout_for_python`` keeps the local-fixture behavior and removes the
scale waste: it reads the OBSERVED scan partition count off the physical
plan (no job — ``df.rdd`` materializes the plan, not the data) and skips
the shuffle when the scan already saturates the executor parallelism.

Env override ``SPARK_GRAFT_FANOUT`` = ``auto`` (default) | ``always`` |
``never`` — the A/B lever tools/scale_probe.py --many-files uses to
measure both branches on a many-file layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def fanout_for_python(df: DataFrame, *key_cols: str) -> DataFrame:
    """Explicit-N repartition (AQE-coalesce-exempt) before a per-row-
    HEAVY stage — a Python codec batch or a hash/expression-dense JVM
    projection (md5-per-gram signature passes, shingle builds) —
    SKIPPED when the scan already provides at least the cluster's
    default parallelism in input splits. Key columns default to
    ``doc_id`` — the keys only spread rows (the downstream stages are
    per-row transforms or map-side partial aggregations), so skipping
    never changes results.

    r16: the single-row-group fixture files plan ONE scan task, so any
    map-side-heavy expression chain serialized on one core regardless
    of ``local[N]`` (measured: the minhash signature pass 2.80 →
    1.27 s and the full LSH+verify chain 3.40 → 1.06 s at sf0.1 with
    the fanout, outputs identical). On a production table the scan
    splits naturally and the auto probe skips the shuffle."""
    keys = key_cols or ("doc_id",)
    mode = os.environ.get("SPARK_GRAFT_FANOUT", "auto")
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    if mode == "never":
        return df
    if mode == "auto":
        try:
            observed = df.rdd.getNumPartitions()
        except Exception:
            observed = 0  # exotic plan: keep the safe fanout
        if observed >= spark.sparkContext.defaultParallelism:
            return df
    return df.repartition(n, *keys)


def sort_after_python(df: DataFrame, *cols: str) -> DataFrame:
    """Deterministic output sort for a per-row Python stage (r15,
    guide §2.4 "an orderBy used only to make output deterministic").

    A bare ``.orderBy`` directly on a MapInPandas output executes the
    whole Python subtree TWICE: range partitioning first SAMPLES its
    child to compute the partition bounds, then shuffles it — and with
    no exchange between the codec stage and the sort, the sample pass
    re-runs every encode/decode (measured on the webp row at sf0.1:
    4.0 s with the bare orderBy, 2.4 s with this helper, output
    identical including row order). Materializing the stage's output
    first (``localCheckpoint``) bounds the re-read to the skinny
    feature rows — orders of magnitude smaller than the decoded payload
    input, the same artifact discipline as the dedup fingerprints.

    The checkpoint hides the Python stage from the final visible plan,
    so the pre-checkpoint frame is attached as ``_pre_sort_child`` for
    the plan-pinning tests (tests/test_plans.py) to assert the fanout
    exchange + MapInPandas shape on.

    ``SPARK_GRAFT_SORT_CHECKPOINT=never`` falls back to the bare
    ``orderBy`` — the same-session A/B lever tools use to price the
    checkpoint per row (it is NOT free: on a row whose under-sort
    segment is already bounded by a shuffle or broadcast artifact the
    resample is cheap and the extra materialization job is pure loss —
    the r15 session-3 finding on the recall-report family)."""
    if os.environ.get("SPARK_GRAFT_SORT_CHECKPOINT", "auto") == "never":
        return sort_plain(df, *cols)
    # eager=False (r15 session-3): the eager form materialized at BUILD
    # time, so composite consumers that take ``unsorted(...)`` (the
    # recall reports) still paid the full checkpoint job for a frame
    # they never execute. Lazily, the sort's range-sampling job is what
    # materializes the partitions and the shuffle reuses them — same
    # one-materialization guarantee for sorted consumers, zero cost for
    # unwrapped ones.
    out = df.localCheckpoint(eager=False).orderBy(*cols)
    out._pre_sort_child = df
    return out


def sort_plain(df: DataFrame, *cols: str) -> DataFrame:
    """Deterministic output sort WITHOUT the checkpoint — the right tail
    when the segment under the sort is already bounded by a shuffle or
    broadcast artifact, so the range sampler's re-read is cheap and the
    checkpoint's extra materialization job is pure loss (r15 session-3
    same-session A/B: the recall-report / ADC top-k family reads
    0.03-0.43 s FASTER bare per row). Still attaches the pre-sort child
    so plan pins and ``unsorted`` work identically on both tails."""
    out = df.orderBy(*cols)
    out._pre_sort_child = df
    return out


def unsorted(df: DataFrame) -> DataFrame:
    """The frame BELOW a deterministic output sort (either tail form).
    Composite consumers (recall reports) join/aggregate the top-k
    frames, where the inner sort is dead weight — Catalyst does not
    reliably eliminate it, and in the checkpointed form it costs a
    materialization job plus a range exchange. Identical rows, order
    dropped — safe exactly where consumption is order-insensitive."""
    return getattr(df, "_pre_sort_child", df)
