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


def mixture_plan(
    df: DataFrame,
    strata_col: str,
    temperature: float = 0.5,
    target_fraction: float = 0.5,
) -> DataFrame:
    """Temperature-smoothed mixture plan (the pretraining-mix staple:
    multinomial sampling with p_s ∝ n_s^α, α<1 upsampling rare domains —
    the mix rule popularized by multilingual/pretraining-corpus papers).
    Returns one row per stratum: (stratum, n_s, keep_frac) where
    keep_frac = min(1, target_fraction · N · n_s^α / Σ n_t^α / n_s).

    α is fixed at 0.5 (sqrt) for the oracle-able form: IEEE sqrt is
    correctly rounded, so Spark and any SQL engine produce bit-identical
    weights — pow(x, α) for general α is only faithfully rounded and may
    flap the final ROUND across libm implementations. ROUND(keep_frac, 6)
    then absorbs division-order noise.

    Scale: ONE skinny count shuffle (#strata rows, map-side partials),
    a 1-row global agg, and a broadcast-sized result — the plan table is
    config-sized (#domains), never data-sized."""
    if temperature != 0.5:
        raise ValueError(
            "oracle-able mixture_plan fixes temperature=0.5 (IEEE sqrt); "
            "general α needs an engine-matched pow and is rows-only"
        )
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_s"))
    tots = counts.agg(
        F.sum(F.sqrt(F.col("n_s").cast("double"))).alias("wsum"),
        F.sum("n_s").alias("n_total"),
    )
    return counts.crossJoin(F.broadcast(tots)).select(
        strata_col,
        "n_s",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(target_fraction)
                * F.col("n_total").cast("double")
                * F.sqrt(F.col("n_s").cast("double"))
                / F.col("wsum")
                / F.col("n_s").cast("double"),
            ),
            6,
        ).alias("keep_frac"),
    )


def mixture_keep(id_col: str | Column) -> Column:
    """Deterministic per-row coin flip against the broadcast plan's
    ``keep_frac``: the id's md5 first 8 hex chars (a uniform 32-bit
    draw) compared lexicographically against the fraction rendered as
    fixed-width lowercase hex — the same engine-portable trick as
    ``split_assign`` (fixed-width lowercase hex compares
    lexicographically == numerically). keep_frac ≥ 1 short-circuits so
    the 9-char '100000000' never enters the string compare. Pure
    projection: zero shuffle, reproducible in any engine with md5()."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    draw = F.substring(F.md5(c.cast("string")), 1, 8)
    thresh = F.format_string(
        "%08x", F.floor(F.col("keep_frac") * F.lit(4294967296.0)).cast("bigint")
    )
    return (F.col("keep_frac") >= 1.0) | (draw < thresh)


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    temperature: float = 0.5,
    target_fraction: float = 0.5,
) -> DataFrame:
    """Sample ``df`` down to ≈target_fraction of its rows with
    temperature-rebalanced per-stratum rates (see ``mixture_plan``).
    Deterministic and stable under corpus growth within a stratum's
    rate: a kept id stays kept while its stratum's keep_frac holds.

    Plan shape: skinny count agg → broadcast plan join → filter
    projection. The corpus is never shuffled; at 100 TB this is a scan
    plus a #domains-row broadcast."""
    plan = mixture_plan(df, strata_col, temperature, target_fraction)
    return df.join(F.broadcast(plan), strata_col).filter(mixture_keep(id_col))


def token_budget_select(
    df: DataFrame,
    id_col: str,
    score_col: str,
    weight_col: str,
    budget_num: int = 1,
    budget_den: int = 2,
) -> DataFrame:
    """Greedy budgeted selection: walk rows in (score DESC, id ASC)
    order, keep while the running sum of ``weight_col`` stays within
    budget = (Σ weight × budget_num) DIV budget_den — "take the best
    documents until the token budget is full", the data-selection step
    after quality scoring.

    EXACT without a global window, via the same two-level prefix sum as
    ``pack_sequences``/the decile histogram: (1) per-score-level weight
    histogram (one skinny shuffle, bounded by the quantized score
    domain, not the corpus); (2) cumulative level prefix over that tiny
    table; (3) levels wholly under budget keep every row with a plain
    filter; ONLY the single boundary level runs a per-row running sum,
    partitioned by its score value — the task is bounded by one level's
    tie count. Integer weights + integer DIV keep the cut engine-exact.
    """
    scored = df.select(
        F.col(id_col).alias("__id"),
        F.col(score_col).alias("__score"),
        F.col(weight_col).cast("bigint").alias("__w"),
    )
    hist = scored.groupBy("__score").agg(F.sum("__w").alias("lvl_w"))
    # global window over the BOUNDED per-level histogram (upstream
    # groupBy shrinks to the quantized score domain) — the shape
    # plans/lint.py's unbounded-global-window check verifies
    w_prev = Window.orderBy(F.desc("__score")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    levels = hist.select(
        "__score",
        "lvl_w",
        F.coalesce(F.sum("lvl_w").over(w_prev), F.lit(0)).alias("prev"),
        F.sum("lvl_w").over(Window.partitionBy()).alias("total"),
    ).withColumn(
        "budget", F.expr(f"total * {int(budget_num)} DIV {int(budget_den)}")
    )
    joined = scored.join(F.broadcast(levels), "__score")
    whole = joined.filter(F.col("prev") + F.col("lvl_w") <= F.col("budget"))
    w_in = Window.partitionBy("__score").orderBy("__id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    boundary = (
        joined.filter(
            (F.col("prev") <= F.col("budget"))
            & (F.col("prev") + F.col("lvl_w") > F.col("budget"))
        )
        .withColumn("__cum_in", F.sum("__w").over(w_in))
        .filter(F.col("prev") + F.col("__cum_in") <= F.col("budget"))
        .drop("__cum_in")
    )
    return (
        whole.unionByName(boundary)
        .select(
            F.col("__id").alias(id_col),
            F.col("__score").alias(score_col),
            F.col("__w").alias(weight_col),
        )
    )


def gumbel_weighted_topk(
    df: DataFrame,
    id_col: str,
    weight: Column,
    k: int,
    salt: str = "gumbel",
    round_to: int = 6,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via the
    Gumbel-max trick (Efraimidis & Spirakis 2006 / Gumbel-top-k):
    score_i = ln(w_i) + G_i with G_i = -ln(-ln(u_i)); the top-k scores
    are an exact sample of k items with probability proportional to
    their weights, drawn without replacement — the production answer to
    "sample a token-budget-proportional subset reproducibly".

    Engine-reproducible randomness, the md5 house trick: u_i derives
    from the first 13 md5 hex chars of the salted id — an exact 52-bit
    integer in both engines — mapped to (0,1) by (h+1)/(2^52+1).
    Weights must be positive (rows with w <= 0 are excluded — they have
    zero sampling probability). Ranking uses the ROUNDED score with an
    id tiebreak so the cut is engine-stable.

    Scale: one projection + TakeOrdered — the corpus is never shuffled
    (same cost class as mixture_sample's md5 thresholds)."""
    idc = F.col(id_col)
    h = F.conv(
        F.substring(F.md5(F.concat(idc.cast("string"), F.lit(":" + salt))), 1, 13),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float((1 << 52) + 1))
    g = -F.log(-F.log(u))
    score = F.round(F.log(weight.cast("double")) + g, round_to)
    return (
        df.where(weight > 0)
        .select(idc, weight.alias("weight"), score.alias("gumbel_score"))
        .orderBy(F.desc("gumbel_score"), id_col)
        .limit(k)
    )
