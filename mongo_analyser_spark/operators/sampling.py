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


def split_assign(
    id_col: str | Column,
    boundaries: list[tuple[str, str | None]] = (
        ("train", "cd"),  # md5 first byte < 0xcd → 205/256 ≈ 80.1%
        ("val", "e6"),    # < 0xe6 → next 25/256 ≈ 9.8%
        ("test", None),   # remainder ≈ 10.2%
    ),
) -> Column:
    """Reproducible dataset-split label from the id's md5: the first hex
    byte lands in [00, ff]; each split takes the ids below its hex
    threshold (lowercase fixed-width hex compares lexicographically ==
    numerically, so the same split is computable in ANY engine as a
    string comparison — no bit twiddling, no engine hash functions).
    Deterministic across runs/engines and stable under corpus growth:
    adding documents never moves an existing id between splits — the
    property random assignment lacks and every training pipeline needs.
    Pure projection: zero shuffle."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    byte = F.substring(F.md5(c.cast("string")), 1, 2)
    expr = None
    for name, upper in boundaries:
        cond = F.lit(True) if upper is None else (byte < F.lit(upper))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


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
