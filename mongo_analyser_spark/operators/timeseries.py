"""Time-series smoothing and outlier detection over event streams —
the batch-analytics siblings of the streaming monitors
(streaming/windows.py): an EWMA smoother and population z-score
outlier flags, both engine-deterministic so they hash-oracle.

Reference parity: the reference's numeric surface stops at per-field
min/max (mongo_analyser/core/analyser.py:194-201); this extends the
[EXT] events tier with the two classic per-series signals a pipeline
monitor derives from them.

Determinism contracts:

- **EWMA** uses α = 0.5 EXACTLY so every step is a multiply by a power
  of two (exact in binary floating point) plus one add: the recursive
  fold ``acc' = 0.5*acc + 0.5*v`` over a trailing window of the last k
  events is the same IEEE op sequence in Spark's ``aggregate`` HOF and
  DuckDB's ``list_reduce`` (both left folds over the same
  uniquely-ordered frame), so results are bit-identical BEFORE the
  final presentation ROUND. No ``pow`` anywhere — pow is not correctly
  rounded and drifts across engines (the mixture_plan lesson; sqrt is
  the only transcendental both engines round correctly).
- **z-scores** divide by the population stddev computed from
  SUM/SUM(v²)/COUNT aggregates; double summation order varies across
  engines, so the score is quantized (ROUND) and the outlier flag
  gates on the ROUNDED score — the gopher_rules discipline: the flag
  can never disagree with the emitted number on an IEEE boundary.

100-TB shape: EWMA is one window over ``(series, ts)`` — state is the
k-row frame, shuffle is one hash partition by series (the same
exchange trailing_window_range_events pins); z-scores are one
grouped aggregate joined back broadcast (``#groups`` rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ewma_smooth(
    df: DataFrame,
    series_col: str,
    order_cols: list,
    val_col: str,
    k: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """Adds ``ewma`` (trailing-k half-life smoother, α=0.5, initialized
    at the window's oldest element) and ``residual`` (value − ewma of
    the PRECEDING window — the one-step-ahead surprise; 0.0 for a
    series' first event) to ``df``."""
    w = (
        Window.partitionBy(series_col)
        .orderBy(*order_cols)
        .rowsBetween(-(k - 1), 0)
    )
    lst = F.collect_list(F.col(val_col).cast("double")).over(w)
    half = F.lit(0.5)

    def fold(col: Column) -> Column:
        return F.aggregate(
            F.slice(col, 2, k),
            F.element_at(col, 1),
            lambda acc, x: acc * half + x * half,
        )

    prev = (
        Window.partitionBy(series_col)
        .orderBy(*order_cols)
        .rowsBetween(-k, -1)
    )
    lst_prev = F.collect_list(F.col(val_col).cast("double")).over(prev)
    # shared floor(x*10^r + 0.5)/10^r quantizer, NOT F.round: the folds
    # are bit-identical across engines, but a half-ulp decimal tie
    # (x = ...4375 at r=6) splits Spark's BigDecimal HALF_UP from
    # DuckDB's ROUND — the pixel-tier lesson, caught by check_oracle
    scale = F.lit(float(10**round_to))
    q = lambda c: F.floor(c * scale + F.lit(0.5)) / scale  # noqa: E731
    ewma = q(fold(lst))
    resid = F.when(F.size(lst_prev) == 0, F.lit(0.0)).otherwise(
        q(F.col(val_col) - fold(lst_prev))
    )
    return df.withColumn("ewma", ewma).withColumn("residual", resid)


def zscore_outliers(
    df: DataFrame,
    group_col: str,
    val_col: str,
    threshold: float = 3.0,
    round_to: int = 4,
) -> DataFrame:
    """Adds ``z_score`` (population z within ``group_col``, ROUNDed)
    and ``is_outlier`` (|rounded z| ≥ threshold) to ``df``. Stats come
    from one grouped SUM/SUM²/COUNT aggregate broadcast back; groups
    with zero variance emit z 0.0."""
    v = F.col(val_col).cast("double")
    stats = df.groupBy(group_col).agg(
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__s2"),
        F.count(v).alias("__n"),
    )
    joined = df.join(F.broadcast(stats), group_col)
    mu = F.col("__s") / F.col("__n")
    var = F.col("__s2") / F.col("__n") - mu * mu
    z = F.when(var <= 0, F.lit(0.0)).otherwise(
        F.round((v - mu) / F.sqrt(var), round_to)
    )
    return (
        joined.withColumn("z_score", z)
        .withColumn("is_outlier", F.abs(F.col("z_score")) >= threshold)
        .drop("__s", "__s2", "__n")
    )
