"""Theta/KMV sketch set algebra: distinct-count sketches per group plus
union / intersection / Jaccard ESTIMATES between groups — the
set-expression member of the mergeable-sketch family (KMV/HLL distinct,
count-min frequency, Bloom membership, bottom-k quantiles).

Reference parity: none directly (the reference has no sketch surface);
public lineage: KMV bottom-k sketches (Bar-Yossef et al. 2002; Cohen &
Kaplan 2007) and the Theta-Sketch Framework (Dasgupta, Lang, Rhodes —
the DataSketches lineage) whose estimators these implement.

Training-pipeline use: per-SOURCE shingle-set sketches answer "how much
content do data providers share?" (cross-source duplication /
contamination) without ever joining the corpora — each source collapses
to k 8-byte ranks, pairwise overlap is array algebra on 2·k longs.

Method: every item is ranked by its md5 52-bit integer (exact in both
engines — the dsir/quantiles trick); a group's sketch is the k smallest
DISTINCT ranks. In estimation mode (n >= k) theta = the k-th smallest
rank, the retained sample is the k-1 ranks BELOW theta, and any set
expression over groups is evaluated on the samples filtered to
h < min(theta_a, theta_b), scaled by 2^52/theta: every rank below theta
is a uniform inclusion at rate theta/2^52. Below capacity the sketch is
the exact set (theta = 2^52) and the estimates ARE the exact counts.

Exactness contract: ranks, thetas, intersection/union counts are exact
integers; estimates are ONE integer multiply (<= k * 2^52 < 2^63, no
overflow) and ONE IEEE double division, ROUND(6)-stable — so the
ESTIMATES themselves hash-match the DuckDB twin, full oracle strength
for approximate set algebra (the same contract as distinct_kmv).

Mergeability: a sketch is the bottom-k of distinct ranks, so
sketch(A ∪ B) = bottom-k(sketch(A) ∪ sketch(B)) — the bottom-k law
pinned for quantiles applies verbatim (same (rank)-cut algebra).

100-TB shape: one distinct-project per corpus (map-side combine takes
(group, rank) pairs), one bounded per-group top-k window, then ALL pair
algebra runs on |groups| k-long arrays — a broadcast-sized artifact;
the corpora never join. The exact-intersection certification join in
the report row is fixture-scale validation, not the production path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mongo_analyser_spark.operators.quantiles import md5_rank

TWO52 = 1 << 52


def theta_sketches(
    df: DataFrame, group_col: str, item: Column, k: int = 128
) -> DataFrame:
    """(group, hs, n_sketch, theta, est_distinct): one KMV sketch row
    per group. hs = sorted bottom-k distinct md5 ranks; theta = k-th
    smallest (estimation mode) or 2^52 (exact mode, n < k);
    est_distinct = (k-1)·2^52/theta, or the exact count below capacity."""
    ranks = (
        df.select(F.col(group_col).alias("group"), md5_rank(item).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("group").orderBy("h")
    sk = (
        ranks.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy("group")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
    )
    full = F.size("hs") >= k
    theta = F.when(full, F.element_at("hs", k)).otherwise(
        F.lit(TWO52).cast("long")
    )
    return sk.select(
        "group",
        "hs",
        F.size("hs").cast("long").alias("n_sketch"),
        theta.alias("theta"),
        F.round(
            F.when(
                full,
                F.lit(k - 1).cast("long")
                * F.lit(TWO52).cast("long")
                / F.element_at("hs", k),
            ).otherwise(F.size("hs").cast("double")),
            6,
        ).alias("est_distinct"),
    )


def theta_pair_overlap(
    sketches: DataFrame, k: int = 128
) -> DataFrame:
    """(group_a, group_b, n_common, n_union, est_inter, est_union,
    est_jaccard) for every unordered group pair: theta-sketch set
    expressions over the retained samples filtered to
    h < min(theta_a, theta_b). n_common/n_union are the exact sample
    counts; est_* scale by 2^52/theta; jaccard = n_common/n_union (an
    exact rational). Pure array algebra over the |groups| sketch rows —
    nothing corpus-sized joins."""
    a = sketches.select(
        F.col("group").alias("group_a"),
        F.col("hs").alias("ha"),
        F.col("theta").alias("ta"),
    )
    b = sketches.select(
        F.col("group").alias("group_b"),
        F.col("hs").alias("hb"),
        F.col("theta").alias("tb"),
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    th = F.least("ta", "tb")
    below = lambda hs: F.filter(hs, lambda x: x < F.col("th"))  # noqa: E731
    staged = pairs.withColumn("th", th).select(
        "group_a",
        "group_b",
        "th",
        below(F.col("ha")).alias("sa"),
        below(F.col("hb")).alias("sb"),
    )
    inter = F.size(F.array_intersect("sa", "sb")).cast("long")
    uni = (F.size("sa") + F.size("sb")).cast("long") - F.size(
        F.array_intersect("sa", "sb")
    ).cast("long")
    return (
        staged.select(
            "group_a",
            "group_b",
            "th",
            inter.alias("n_common"),
            uni.alias("n_union"),
        )
        .select(
            "group_a",
            "group_b",
            "n_common",
            "n_union",
            F.round(
                F.col("n_common") * F.lit(TWO52).cast("long") / F.col("th"), 6
            ).alias("est_inter"),
            F.round(
                F.col("n_union") * F.lit(TWO52).cast("long") / F.col("th"), 6
            ).alias("est_union"),
            F.when(
                F.col("n_union") > 0,
                F.round(F.col("n_common") / F.col("n_union"), 6),
            ).alias("est_jaccard"),
        )
        .orderBy("group_a", "group_b")
    )


def theta_overlap_report(
    df: DataFrame,
    group_col: str,
    item: Column,
    k: int = 128,
    round_to: int = 6,
) -> DataFrame:
    """Pair overlap estimates PLUS the exact intersection count and the
    signed estimate error — the certification row (countmin/bloom
    contract): exact sides exist at fixture scale to verify the
    estimator; production keeps only the sketch rows.

    The distinct (group, item) frame is materialized ONCE and shared by
    the sketch and both exact-join sides (r15, guide §1.2): the
    un-shared form re-ran the corpus explode + distinct per consumer
    (3x) and hashed md5 per item OCCURRENCE instead of per distinct
    item. Ranks from distinct items are the same rank multiset
    (distinct∘md5∘distinct == distinct∘md5), so the sketch — and every
    estimate — is bit-identical (A/B at sf0.1: 2.55 → 2.28 s min, rows
    identical). Materializing a distinct-gram frame is acceptable HERE
    because this is the certification row (exact sides are
    fixture-scale validation, see module docstring); the production
    path (theta_sketches alone) stays unmaterialized."""
    items = (
        df.select(F.col(group_col).alias("group"), item.alias("it"))
        .distinct()
        .localCheckpoint()
    )
    est = theta_pair_overlap(theta_sketches(items, "group", F.col("it"), k), k)
    ia = items.select(F.col("group").alias("group_a"), "it")
    ib = items.select(F.col("group").alias("group_b"), "it")
    exact = (
        ia.join(ib, "it")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    return (
        est.join(exact, ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            "n_common",
            "n_union",
            "est_inter",
            "est_union",
            "est_jaccard",
            F.coalesce(F.col("exact_inter"), F.lit(0)).cast("long").alias(
                "exact_inter"
            ),
            F.round(
                F.col("est_inter")
                - F.coalesce(F.col("exact_inter"), F.lit(0)),
                round_to,
            ).alias("err"),
        )
        .orderBy("group_a", "group_b")
    )


def theta_pair_difference(sketches: DataFrame) -> DataFrame:
    """(group_a, group_b, n_a_only, n_b_only, est_a_only, est_b_only):
    set-DIFFERENCE estimates for every unordered group pair, completing
    the theta set algebra (union/intersection/Jaccard in
    ``theta_pair_overlap``): below the shared theta, the A\\B sample is
    the retained A ranks absent from B, and the estimate scales by
    2^52/theta like every other theta set expression. Same bounded
    algebra — |groups| sketch rows, nothing corpus-sized."""
    a = sketches.select(
        F.col("group").alias("group_a"),
        F.col("hs").alias("ha"),
        F.col("theta").alias("ta"),
    )
    b = sketches.select(
        F.col("group").alias("group_b"),
        F.col("hs").alias("hb"),
        F.col("theta").alias("tb"),
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    below = lambda hs: F.filter(hs, lambda x: x < F.col("th"))  # noqa: E731
    staged = pairs.withColumn("th", F.least("ta", "tb")).select(
        "group_a",
        "group_b",
        "th",
        below(F.col("ha")).alias("sa"),
        below(F.col("hb")).alias("sb"),
    )
    n_inter = F.size(F.array_intersect("sa", "sb")).cast("long")
    n_a = (F.size("sa").cast("long") - n_inter).alias("n_a_only")
    n_b = (F.size("sb").cast("long") - n_inter).alias("n_b_only")
    # multiply-then-divide: one exact long multiply + ONE IEEE division,
    # mirroring theta_pair_overlap and the SQL twin's op order (a
    # divide-first form adds a second rounding and can differ by 1 ulp
    # on ROUND(6) boundaries in estimation mode)
    two52 = F.lit(TWO52).cast("long")
    return (
        staged.select("group_a", "group_b", "th", n_a, n_b)
        .select(
            "group_a",
            "group_b",
            "n_a_only",
            "n_b_only",
            F.round(F.col("n_a_only") * two52 / F.col("th"), 6).alias(
                "est_a_only"
            ),
            F.round(F.col("n_b_only") * two52 / F.col("th"), 6).alias(
                "est_b_only"
            ),
        )
        .orderBy("group_a", "group_b")
    )


def theta_difference_report(
    df: DataFrame,
    group_col: str,
    item: Column,
    k: int = 128,
    round_to: int = 6,
) -> DataFrame:
    """Difference estimates PLUS the exact |A\\B| / |B\\A| counts and
    signed errors — the certification form (countmin/bloom contract):
    exact distinct-per-group minus exact intersection, both fixture-
    scale validation sides.

    Shares ONE materialized distinct (group, item) frame across the
    sketch, per-group-count, and both exact-join consumers — same r15
    rationale and bit-identity argument as theta_overlap_report (this
    report had FOUR corpus explode+distinct passes before)."""
    items = (
        df.select(F.col(group_col).alias("group"), item.alias("it"))
        .distinct()
        .localCheckpoint()
    )
    est = theta_pair_difference(theta_sketches(items, "group", F.col("it"), k))
    nd = items.groupBy("group").agg(F.count(F.lit(1)).alias("nd"))
    ia = items.select(F.col("group").alias("group_a"), "it")
    ib = items.select(F.col("group").alias("group_b"), "it")
    exact_i = (
        ia.join(ib, "it")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    ei = F.coalesce(F.col("exact_inter"), F.lit(0)).cast("long")
    return (
        est.join(exact_i, ["group_a", "group_b"], "left")
        .join(
            nd.select(F.col("group").alias("group_a"), F.col("nd").alias("nda")),
            "group_a",
        )
        .join(
            nd.select(F.col("group").alias("group_b"), F.col("nd").alias("ndb")),
            "group_b",
        )
        .select(
            "group_a",
            "group_b",
            "n_a_only",
            "n_b_only",
            "est_a_only",
            "est_b_only",
            (F.col("nda") - ei).alias("exact_a_only"),
            (F.col("ndb") - ei).alias("exact_b_only"),
            F.round(F.col("est_a_only") - (F.col("nda") - ei), round_to).alias(
                "err_a"
            ),
            F.round(F.col("est_b_only") - (F.col("ndb") - ei), round_to).alias(
                "err_b"
            ),
        )
        .orderBy("group_a", "group_b")
    )
