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
    series' first event) to ``df``.

    Round-13 re-plan (the Zipf-tier follow-up, SCALE.md round-13): the
    first form collected the trailing frame into an array and ran an
    interpreted ``aggregate`` HOF fold per row — array materialization
    plus 2·k lambda probes per row, all interpreted. The fold is now
    UNROLLED into a when-guarded lag chain (the same IEEE op sequence
    from the oldest AVAILABLE lag down to the current row, so results
    stay bit-identical to the DuckDB list_reduce twin — verified 0
    mismatches at sf0.1 and the Zipf decade), which stays in
    whole-stage codegen: measured 1.3× faster on the uniform tier and
    1.6× on the hot-key tier. Precondition either way: a null value
    poisons its frames (the old collect_list silently DROPPED nulls
    while DuckDB's list() keeps them, so null inputs never hash-matched
    anyway — filter first).

    Skew bound (measured, tools/scale_probe.py --zipf): an ordered
    per-series recurrence is inherently one task per series — a key
    owning 50% of the table costs ~2.5× the uniform decade, O(n_k log
    n_k) in the hot key's rows. That bound is semantic, not a plan
    defect; the skew-proof form is the streaming monitor
    (streaming/windows.py family), whose per-event update keeps O(1)
    state per series and never sorts the history."""
    w0 = Window.partitionBy(series_col).orderBy(*order_cols)
    v = F.col(val_col).cast("double")
    half = F.lit(0.5)

    def lagv(j: int) -> Column:
        return v if j == 0 else F.lag(v, j).over(w0)

    def chain(lo: int, hi: int) -> Column:
        # left fold acc' = 0.5*acc + 0.5*x from the oldest available
        # lag in [lo, hi] down to lo — A_hi = l_hi; A_j = l_j when
        # l_{j+1} is the frame edge (null), else 0.5*A_{j+1} + 0.5*l_j
        acc = lagv(hi)
        for j in range(hi - 1, lo - 1, -1):
            acc = F.when(lagv(j + 1).isNull(), lagv(j)).otherwise(
                acc * half + lagv(j) * half
            )
        return acc

    # shared floor(x*10^r + 0.5)/10^r quantizer, NOT F.round: the folds
    # are bit-identical across engines, but a half-ulp decimal tie
    # (x = ...4375 at r=6) splits Spark's BigDecimal HALF_UP from
    # DuckDB's ROUND — the pixel-tier lesson, caught by check_oracle
    scale = F.lit(float(10**round_to))
    q = lambda c: F.floor(c * scale + F.lit(0.5)) / scale  # noqa: E731
    ewma = q(chain(0, k - 1))
    resid = F.when(lagv(1).isNull(), F.lit(0.0)).otherwise(
        q(v - chain(1, k))
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
