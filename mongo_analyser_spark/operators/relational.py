"""Relational operators [EXT] (SURVEY.md §2.3 J2-J5, §2.5 W4, §2.6):
thin, scale-aware wrappers over Spark built-ins plus the composite
patterns Spark lacks as primitives (as-of join, top-k per group).

Scale notes baked into each helper's plan shape:
* dimension sides of star joins go through ``F.broadcast`` — at 100 TB the
  fact table never shuffles for a 25-row nation table;
* top-k per group is window row_number (one shuffle on the partition key),
  never a global sort;
* the as-of join is the union+window pattern (SURVEY J5): one shuffle on
  (key), no range explosion, no per-row lookups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame, partition_by: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """row_number() <= k with a caller-supplied TOTAL order (ties must be
    broken — Counter.most_common insertion order is not reproducible
    distributed, SURVEY §7.3)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
    seed: int = 42,
    salt_col: str | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: split each hot key of the large side
    across ``buckets`` salt values and replicate the small side's
    matching rows into every bucket, so one pathological key spreads over
    ``buckets`` tasks instead of stalling a single reducer.

    AQE's skew-join handles most cases at runtime; this is the explicit
    form for when the small side is too big to broadcast AND a key is hot
    enough to need pre-planned spreading (e.g. the null-key / default-key
    pileups common in 100 TB log joins). Result is identical to
    ``large.join(small, key, how)`` — salt never leaves the operator.

    The salt is CONTENT-DERIVED (round-2 verdict #7): xxhash64 of
    ``salt_col`` (a row-distinguishing column, e.g. the row id) or, by
    default, of every large-side column — so the bucket assignment is
    reproducible across runs, retries, and repartitionings, unlike
    ``F.rand`` whose draw depends on partition layout. Rows that are
    bit-identical across ALL hashed columns land in one bucket; they
    carry no distinguishing content to spread by.

    Only inner/left are valid: the replicated small side would duplicate
    unmatched rows under right/full semantics."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_src = [F.col(salt_col)] if salt_col else [F.col(c) for c in large.columns]
    salted_large = large.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_src, F.lit(seed)), F.lit(buckets)).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return salted_large.join(replicated_small, [key, "__salt"], how).drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    out_col: str,
) -> DataFrame:
    """As-of join: attach to each left row the most recent right row with
    right_ts <= left_ts for the same key (SURVEY §2.3 J5).

    Implementation: tag + union + `last(ignorenulls)` over an ordered
    window, then keep left rows. One shuffle on (key); state per key is a
    single running value — safe for arbitrarily long histories. Right rows
    sort before left rows at equal timestamps so an exactly-simultaneous
    right row IS visible to the left row (inclusive as-of). The window
    order ends with __rv so several right rows sharing (key, right_ts)
    fold deterministically (the max value wins) instead of depending on
    partition-internal row order.
    """
    lcols = [F.col(c) for c in left.columns]
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_value].dataType).alias("__rv"),
        F.struct(*lcols).alias("__payload"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_value).alias("__rv"),
        F.lit(None).cast(l_tagged.schema["__payload"].dataType).alias("__payload"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", F.col("__rv").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged)
    return (
        unioned.withColumn(out_col, F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .select("__payload.*", out_col)
    )
