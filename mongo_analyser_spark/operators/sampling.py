"""Sampling operators [EXT]: the training-data-mix primitives.

Two flavors per the repo's determinism rule (queries.py module doc):
* ``stratified_take`` — DETERMINISTIC per-stratum quotas via md5-ranked
  row_number, reproducible bit-for-bit in any engine (the oracle-able
  form; also what you want for a reproducible training mix);
* ``stratified_sample`` — true Bernoulli per-stratum fractions
  (``df.sampleBy``), the statistically-uniform form, pytest-bounded
  (random streams are engine-specific, so no SQL oracle by design).

Scale: both are one shuffle on the stratum key at most — ``sampleBy``
is scan-time per-row coin flips (NO shuffle at all); ``stratified_take``
is one window shuffle on (stratum), the same cost as any top-k-per-group.
Quota maps live driver-side as literals (strata counts are config-sized,
not data-sized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stratified_take(
    df: DataFrame,
    strata_col: str | Column,
    quotas: dict[str, int],
    order_key: Column,
    default_quota: int = 0,
) -> DataFrame:
    """Keep the first ``quotas[stratum]`` rows per stratum, ranked by
    ``order_key`` (pass e.g. ``F.md5(id.cast("string"))`` for a
    deterministic pseudo-random draw). Strata missing from ``quotas``
    keep ``default_quota`` rows."""
    strata = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    quota_map = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )
    w = Window.partitionBy(strata).orderBy(order_key)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(
            F.col("__rn")
            <= F.coalesce(F.element_at(quota_map, strata), F.lit(default_quota))
        )
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int | None = None,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`df.sampleBy`): zero shuffle,
    approximate counts n_s × f_s. The scale path for rebalancing a
    100 TB corpus where exact quotas don't matter."""
    return df.sampleBy(strata_col, fractions, seed=seed)
