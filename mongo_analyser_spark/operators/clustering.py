"""Distributed corpus clustering over embedding columns — spherical
k-means (Lloyd) as pure DataFrame algebra, plus the SemDeDup-style
cluster-then-dedup-within-cluster pass built on it.

The driver-side ``similarity.kmeans_centroids`` trains a quantizer on a
bounded SAMPLE; this module is the full-corpus path: every vector
participates in assignment and update, nothing is collected to the
driver, and the per-iteration state that moves is exactly one broadcast
row of k centroids — the same shape Spark MLlib's KMeans ships per step.

Reference parity: clustering/dedup tier [EXT] beyond the reference's
per-collection scans (mongo_analyser/core/analyser.py); SemDeDup follows
Abbas et al. 2023 (arXiv:2303.09540): duplicates are pairs in the SAME
coarse cell above a cosine threshold, so the quadratic verify is bounded
per-cell instead of corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_dot(a: Column, b: Column) -> Column:
    """Left-fold dot product — sequential accumulation, bit-identical to
    an unrolled ``a[1]*b[1] + ... + a[n]*b[n]`` SQL chain."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def normalized_vectors(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, v) with v = vec/||vec|| as array<double> — the unit-sphere
    projection every spherical-k-means stage shares. Pure projection,
    no shuffle.

    Round-13 fix (found by tools/scale_probe.py --wide-vectors): the
    first form computed the norm fold INSIDE the transform lambda —
    interpreted HOFs have no CSE across element probes, so the O(d)
    fold re-ran per element, O(d²) per row (the hof-inline-producer
    class, plans/lint.py; invisible at the 64-dim fixture, 124 s for
    2,000 rows of 768 dims in the k-means SEED path alone). A staged
    projection does NOT survive here: CollapseProject re-inlines any
    once-referenced producer into the lambda regardless of cost (the
    char_entropy staging works only because its producers are consumed
    >= 2 times per projection). The collapse-proof form pins the
    evaluation count STRUCTURALLY: array_repeat(norm, d) evaluates its
    argument exactly once per row, and zip_with divides element-wise —
    same IEEE ops per element, O(d) per row, one extra O(d) array. The
    768-dim probe: 124 s -> sub-second."""
    vec = F.col(vec_col)
    nrm = F.sqrt(_fold_dot(vec, vec))
    return df.select(
        F.col(id_col).alias("id"),
        F.zip_with(
            vec,
            F.array_repeat(nrm, F.size(vec)),
            lambda x, n: x.cast("double") / n,
        ).alias("v"),
    )


def seed_centroids_row(nv: DataFrame, k: int) -> DataFrame:
    """Deterministic init: the k smallest-id unit vectors, packed into
    ONE row of array<struct<cid,int v:array<double>>> sorted by cid.
    Centroids travel as broadcast DATA (one row), never as plan
    literals — the plan stays constant-size as k and dim grow (the
    similarity.py SRP-plane lesson)."""
    from pyspark.sql import Window

    # global row_number over the k seed rows only — the .limit(k) below
    # it is what plans/lint.py's unbounded-global-window check verifies
    w = Window.orderBy("id")
    init = (
        nv.orderBy("id")
        .limit(k)
        .select(F.row_number().over(w).alias("cid"), "v")
    )
    return init.agg(
        F.sort_array(F.collect_list(F.struct("cid", "v"))).alias("cents")
    )


def assign_cells(nv: DataFrame, cents_row: DataFrame) -> DataFrame:
    """(id, v, cell): nearest centroid by max dot product, ties to the
    lowest cid (array_position finds the FIRST max in cid order). One
    projection over a broadcast one-row cross join — no shuffle, no
    per-(vector,centroid) row explosion."""
    scores = F.transform(F.col("cents"), lambda c: _fold_dot(F.col("v"), c["v"]))
    return (
        nv.crossJoin(F.broadcast(cents_row))
        .select(
            "id",
            "v",
            F.array_position(scores, F.array_max(scores)).cast("int").alias("cell"),
        )
    )


def collect_cents(cents_row: DataFrame):
    """Collect the one-row centroid table to (cids int32[], C float64
    (k, dim)) — a BOUNDED driver artifact (k×dim doubles; the PQ
    collect_codebook class), shipped to executors inside the Arrow
    kernel closure."""
    import numpy as np

    cents = cents_row.collect()[0]["cents"]  # sorted by cid
    cids = np.array([c["cid"] for c in cents], dtype=np.int32)
    C = np.array([c["v"] for c in cents], dtype=np.float64)
    return cids, C


def assign_cells_arrow(
    df: DataFrame, id_col: str, vec_col: str, cents_row: DataFrame
) -> DataFrame:
    """(id, v, cell): Arrow-batched twin of ``normalized_vectors`` +
    ``assign_cells`` — one vectorized normalize+assign per batch against
    the driver-collected centroids. BIT-identical to the fold forms
    (pytest-pinned, tests/test_clustering.py): the norm and every dot
    accumulate per COMPONENT IN INDEX ORDER (the operators/pq.py Arrow
    contract — same IEEE double ops in the same order as the left
    folds), the per-component division x/||x|| is the same single IEEE
    op, and np.argmax takes the FIRST maximum = array_position's
    first-equal rule with centroids in ascending-cid order. Kills the
    interpreted k×dim lambda cost per vector (the round-9/10 per-row
    constant lesson) without touching the oracle contract."""
    import numpy as np
    import pandas as pd

    cids, C = collect_cents(cents_row)
    k, dim = C.shape

    def kern(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            acc = np.zeros(len(X), dtype=np.float64)
            for j in range(dim):
                acc = acc + X[:, j] * X[:, j]
            V = X / np.sqrt(acc)[:, None]
            S = np.zeros((len(X), k), dtype=np.float64)
            for j in range(dim):
                S = S + V[:, j : j + 1] * C[None, :, j]
            cell = cids[np.argmax(S, axis=1)]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "v": list(V),
                    "cell": cell,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        kern, "id long, v array<double>, cell int"
    )


def kmeans_step(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    cents_row: DataFrame | None = None,
    round_to: int | None = 6,
    arrow: bool = False,
) -> DataFrame:
    """One Lloyd iteration, long-form output (cell, pos, n_members,
    mean_val): assign every vector to its nearest centroid, then the
    per-cell per-dimension mean of the unit vectors.

    Shuffle budget: exactly ONE — the (cell, pos) aggregate, whose
    map-side partial combine reduces each task's contribution to
    ≤ k×dim rows regardless of corpus size. Assignment itself is a
    shuffle-free projection (see assign_cells). Dots and norms are
    sequential left-folds, so an engine-independent oracle reproduces
    the assignment bit-for-bit; only the mean's summation order is
    engine-dependent, absorbed by round_to. Empty cells emit no rows in
    either engine."""
    if k <= 0:
        raise ValueError("kmeans_step requires k >= 1")
    nv = normalized_vectors(df, id_col, vec_col)
    if cents_row is None:
        cents_row = seed_centroids_row(nv, k)
    if arrow:
        # vectorized normalize+assign, bit-identical to the fold path
        # (see assign_cells_arrow); reads the RAW vectors so the fold
        # normalize doesn't run at all
        assigned = assign_cells_arrow(df, id_col, vec_col, cents_row)
    else:
        assigned = assign_cells(nv, cents_row)
    mean_val = F.avg("val")
    if round_to is not None:
        mean_val = F.round(mean_val, round_to)
    return (
        assigned.select("cell", F.posexplode("v").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            mean_val.alias("mean_val"),
        )
        .select(
            "cell",
            (F.col("pos") + 1).alias("pos"),  # 1-based like SQL subscripts
            "n_members",
            "mean_val",
        )
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 5,
) -> DataFrame:
    """Full distributed spherical k-means: iterate kmeans_step, folding
    each iteration's (unrounded) means back into the one-row broadcast
    centroid table, re-normalized onto the unit sphere. Returns the
    final assignment (id, cell).

    Per iteration: one k×dim-bounded aggregate shuffle + a
    localCheckpoint of the ONE-ROW centroid table (truncates lineage so
    the plan doesn't nest iterations — the connected-components
    lesson, operators/dedup.py). Empty cells keep their previous
    centroid (standard Lloyd fallback) via the left join + coalesce."""
    if k <= 0 or iters <= 0:
        raise ValueError("kmeans_fit requires k >= 1 and iters >= 1")
    nv = normalized_vectors(df, id_col, vec_col)
    nv = nv.persist()
    cents_row = seed_centroids_row(nv, k).localCheckpoint(eager=True)
    for _ in range(iters):
        step = kmeans_step(nv, "id", "v", k=k, cents_row=cents_row, round_to=None)
        new_cents = (
            step.groupBy("cell")
            .agg(
                F.sort_array(F.collect_list(F.struct("pos", "mean_val"))).alias("pm")
            )
            .select(
                F.col("cell").alias("cid"),
                F.transform(F.col("pm"), lambda s: s["mean_val"]).alias("m"),
            )
        )
        # renormalize onto the unit sphere; empty cells fall back to the
        # previous centroid
        prev = cents_row.select(F.explode("cents").alias("c")).select(
            F.col("c.cid").alias("pcid"), F.col("c.v").alias("pv")
        )
        nrm = F.sqrt(_fold_dot(F.col("m"), F.col("m")))
        merged = prev.join(new_cents, F.col("pcid") == F.col("cid"), "left").select(
            F.col("pcid").alias("cid"),
            F.coalesce(
                F.when(
                    nrm > 0.0, F.transform(F.col("m"), lambda x: x / nrm)
                ),
                F.col("pv"),
            ).alias("v"),
        )
        cents_row = (
            merged.agg(F.sort_array(F.collect_list(F.struct("cid", "v"))).alias("cents"))
            .localCheckpoint(eager=True)
        )
    out = assign_cells(nv, cents_row).select("id", "cell")
    nv.unpersist()
    return out


def _assign_full_arrow(
    df: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """(id, v array<double>, nrm, cell) — the Arrow twin of
    semantic_dedup's broadcast-data assignment projection: v is the
    exact float→double cast of the input vector (Arrow-level cast,
    nulls preserved), nrm the left-fold norm, cell the 1-based
    first-max centroid (np.argmax == array_position-of-array_max,
    including the all-NaN row both resolve to cell 1). Rows the
    expression form could not score keep its outputs: NULL vector →
    all-NULL; null element → v keeps the hole, nrm/cell NULL; ragged
    length → real nrm over the vector's own length, cell NULL."""
    import numpy as np
    import pyarrow as pa

    Cn = np.asarray(centroids, dtype=np.float64)
    k, dim = Cn.shape
    id_t = df.schema[id_col].dataType.simpleString()
    src = df.select(id_col, vec_col)

    def kern(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            idc, vc = b.column(0), b.column(1)
            flat = vc.flatten()
            n = b.num_rows
            lens = (
                np.diff(vc.offsets.to_numpy(zero_copy_only=False))
                if vc.null_count == 0
                else None
            )
            v_out = vc.cast(pa.list_(pa.float64()))
            if (
                lens is not None
                and (lens == dim).all()
                and flat.null_count == 0
            ):
                X = flat.to_numpy(zero_copy_only=False).astype(
                    np.float64, copy=False
                ).reshape(n, dim)
                nacc = np.zeros(n, dtype=np.float64)
                for j in range(dim):
                    nacc = nacc + X[:, j] * X[:, j]
                nrm_arr = pa.array(np.sqrt(nacc), type=pa.float64())
                from mongo_analyser_spark.operators.similarity import (
                    fold_scores_np,
                )

                S = fold_scores_np(X, Cn)
                cell_arr = pa.array(
                    (np.argmax(S, axis=1) + 1).astype(np.int32)
                )
            else:
                from mongo_analyser_spark.operators.similarity import (
                    fold_scores_np,
                )

                nrm, cell = [], []
                for v in vc.to_pylist():
                    if v is None or any(e is None for e in v):
                        nrm.append(None)
                        cell.append(None)
                        continue
                    x = np.asarray(v, dtype=np.float64)
                    a = 0.0
                    for xx in x:
                        a = a + xx * xx
                    nrm.append(float(np.sqrt(a)))
                    if len(x) != dim:
                        cell.append(None)
                    else:
                        s = fold_scores_np(x[None, :], Cn)[0]
                        cell.append(int(np.argmax(s)) + 1)
                nrm_arr = pa.array(nrm, type=pa.float64())
                cell_arr = pa.array(cell, type=pa.int32())
            yield pa.RecordBatch.from_arrays(
                [idc, v_out, nrm_arr, cell_arr],
                names=["id", "v", "nrm", "cell"],
            )

    return src.mapInArrow(
        kern, f"id {id_t}, v array<double>, nrm double, cell int"
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): coarse-quantize the corpus into
    cells, then within each cell greedily drop any vector whose cosine
    to an EARLIER (lower-id) same-cell vector meets the threshold.
    Output (id, cell, is_kept) — one row per input vector.

    Unlike connected-component dedup (transitive closure over banded
    pairs, operators/dedup.py), the cluster boundary here is a hard
    blocking key: the quadratic exact verify is per-cell, so cell count
    k is the knob that bounds worst-case work (k ~ n/target_cell_size
    at scale). The within-cell self-join is an equi-join on cell with
    id_a < id_b; cosine is ROUNDed before the threshold test so both
    engines agree on boundary pairs; the drop set is applied as a left
    join + flag (not anti-join) to keep the one-row-per-vector
    contract. Fixed centroid literals keep the oracle twin exact —
    kmeans_fit supplies data-adaptive cells when recall matters more
    than oracle exactness.

    Norms are computed ONCE per vector before the self-join (a
    higher-order-function fold is interpreted, not codegen'd, so
    per-pair norm recomputation would triple the dominant cost: 3×
    measured at sf0.1); the per-pair work is exactly one dot fold. The
    division uses the same raw-vector norm the oracle's SQL chain
    computes, so the rounded cosine stays bit-identical.

    Centroids ship as ONE broadcast row of data, never as plan
    literals: with cell count scaling as n/target_cell_size, a literal
    unroll (k×dim terms, the similarity.ivf_cell style) makes plan
    analysis itself the bottleneck as the corpus grows — measured flat
    3.8 s at sf0.1/32 cells with literals, where the data-borne
    assignment stays proportional to actual work. The fold dots consume
    the same double values in the same order as the oracle's literal
    SQL chain, so assignments are still bit-identical."""
    if not centroids:
        raise ValueError("semantic_dedup requires a non-empty centroid list")
    # r15 (guide §4.2, the ivf_topk/with_srp_sig move): the k×dim
    # assignment + norm folds per vector ran interpreted under the
    # broadcast-data cross join — the Arrow kernel computes the same
    # doubles in left-fold order (parity pinned in
    # tests/test_clustering.py, incl. NULL/ragged/NaN rows), so cells,
    # norms, and every downstream cosine are bit-identical.
    # Referenced three ways below (both self-join sides + the final
    # flag join): without materialization the assignment re-runs per
    # reference (the triangle_counts lesson — measured 3.66 s -> 2.46 s
    # solo at sf0.1). This checkpoints vectors too, the simple
    # fixture-scale call; a 100-TB run would checkpoint only
    # (id, nrm, cell) and re-join vectors from the scan, the
    # cosine_near_dup_pairs fingerprint discipline.
    vecs = _assign_full_arrow(df, id_col, vec_col, centroids).localCheckpoint()
    a = vecs.select(
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("nrm_a"),
        F.col("cell").alias("ca"),
    )
    b = vecs.select(
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nrm_b"),
        F.col("cell").alias("cb"),
    )
    cos = F.round(
        _fold_dot(F.col("va"), F.col("vb")) / (F.col("nrm_a") * F.col("nrm_b")), 6
    )
    dropped = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("id_a") < F.col("id_b")))
        .filter(cos >= threshold)
        .select(F.col("id_b").alias("dropped_id"))
        .distinct()
    )
    return vecs.join(
        dropped, F.col("id") == F.col("dropped_id"), "left"
    ).select(
        "id",
        "cell",
        F.col("dropped_id").isNull().alias("is_kept"),
    )
