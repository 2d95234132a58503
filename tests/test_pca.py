"""Decorrelation tier (operators/pca.py): covariance against numpy,
PCA projection against a direct numpy reference (the declared
rows-only registry row's correctness evidence), JL determinism and
distance preservation."""

from __future__ import annotations

import math

import numpy as np

from mongo_analyser_spark.operators.pca import (
    covariance_matrix,
    covariance_upper,
    jl_planes,
    jl_project,
    pca_components,
    pca_project,
)

DIM = 6
VECS = [
    (i, [float(((i * 7 + k * 3) % 11) - 5) for k in range(DIM)])
    for i in range(40)
]


def _df(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<double>")


def _np_x():
    return np.array([v for _, v in VECS])


def test_covariance_matches_numpy(spark):
    rows = covariance_upper(_df(spark), "vec_id", "embedding", DIM).collect()
    X = _np_x()
    want = np.cov(X, rowvar=False, bias=True)  # population covariance
    assert len(rows) == DIM * (DIM + 1) // 2
    for r in rows:
        assert r["n"] == len(VECS)
        assert math.isclose(
            r["cov"], round(want[r["i"] - 1, r["j"] - 1], 6), abs_tol=1e-6
        )


def test_covariance_matrix_is_symmetric_collect(spark):
    m, n = covariance_matrix(_df(spark), "vec_id", "embedding", DIM)
    assert n == len(VECS)
    assert np.allclose(m, m.T)


def test_pca_projection_matches_numpy_reference(spark):
    df = _df(spark)
    k = 3
    comps, ratios = pca_components(df, "vec_id", "embedding", DIM, k)
    # reference eigh on the same rounded covariance
    m, _ = covariance_matrix(df, "vec_id", "embedding", DIM)
    vals, vecs = np.linalg.eigh(m)
    order = np.argsort(vals)[::-1][:k]
    X = _np_x()
    got = {
        r["vec_id"]: list(r["proj"])
        for r in pca_project(df, "vec_id", "embedding", DIM, k).collect()
    }
    for c, idx in enumerate(order):
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        assert np.allclose(comps[c], v)
        for vid, x in VECS:
            assert math.isclose(
                got[vid][c], round(float(np.dot(x, v)), 6), abs_tol=1e-6
            )
    # explained-variance ratios are sorted and sum <= 1
    assert ratios == sorted(ratios, reverse=True)
    assert sum(ratios) <= 1.0 + 1e-9


def test_jl_planes_deterministic_and_scaled():
    p1 = jl_planes(8, DIM)
    p2 = jl_planes(8, DIM)
    assert p1 == p2
    scale = 1.0 / math.sqrt(8)
    assert all(abs(abs(v) - scale) < 1e-12 for row in p1 for v in row)


def test_jl_preserves_distances_in_expectation(spark):
    """JL with +/-1/sqrt(k) rows is an unbiased estimator of squared
    distances; at k=16 over 40 points the mean ratio must land near 1
    (loose band — this is a sanity check, not a concentration proof)."""
    df = _df(spark)
    got = {
        r["vec_id"]: np.array(r["proj"])
        for r in jl_project(df, "vec_id", "embedding", DIM, 16).collect()
    }
    X = {vid: np.array(v) for vid, v in VECS}
    ratios = []
    ids = list(got)
    for a in ids[:10]:
        for b in ids[10:20]:
            d0 = float(np.sum((X[a] - X[b]) ** 2))
            if d0 == 0:
                continue
            d1 = float(np.sum((got[a] - got[b]) ** 2))
            ratios.append(d1 / d0)
    mean = sum(ratios) / len(ratios)
    assert 0.5 < mean < 1.5


def test_pca_power_components_deterministic_and_unit_norm():
    """The power-iteration recurrence: bit-identical across runs, unit
    norm within quantization, Rayleigh quotients inside the spectrum's
    range (the weak numpy cross-check — the hash ORACLE is the
    contract; see q_pca_project's docstring on the flat spectrum)."""
    import numpy as np

    from mongo_analyser_spark.operators.pca import pca_power_components

    rng = np.random.RandomState(11)
    A = rng.randn(12, 12)
    C = np.round((A @ A.T) / 12.0, 6)
    Cl = [[float(x) for x in row] for row in C]
    c1, l1 = pca_power_components(Cl, k=3, iters=16)
    c2, l2 = pca_power_components(Cl, k=3, iters=16)
    assert c1 == c2 and l1 == l2  # bit-identical determinism
    vals = np.linalg.eigvalsh(C)
    for v, lam in zip(c1, l1):
        n = float(np.linalg.norm(v))
        assert abs(n - 1.0) < 1e-6
        # Rayleigh quotient of any unit vector lies in [λmin, λmax];
        # after 16 deflated iterations it should sit in the top half
        assert lam <= vals[-1] + 1e-6
        assert lam >= float(np.median(vals)) - 1e-6


def test_pca_power_converges_on_separated_spectrum():
    """On a well-separated spectrum the fixed-iteration form DOES
    recover the numpy eigenvectors — the flat-spectrum caveat is about
    the corpus, not the algorithm."""
    import numpy as np

    from mongo_analyser_spark.operators.pca import pca_power_components

    rng = np.random.RandomState(5)
    Q, _ = np.linalg.qr(rng.randn(10, 10))
    C = np.round(Q @ np.diag([9.0, 4.0, 2.0] + [0.1] * 7) @ Q.T, 6)
    comps, lams = pca_power_components(
        [[float(x) for x in r] for r in C], k=3, iters=16
    )
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1]
    for i, (v, lam) in enumerate(zip(comps, lams)):
        ref = vecs[:, order[i]]
        assert abs(float(np.dot(v, ref))) > 0.999
        assert abs(lam - vals[order[i]]) < 0.01


def test_pca_power_project_matches_driver_recurrence(spark):
    """The distributed projection equals a hand fold over the same
    components (exact — floor quantizer both sides)."""
    import math

    import numpy as np

    from mongo_analyser_spark.operators.pca import (
        covariance_as_matrix,
        pca_power_components,
        pca_power_project,
    )

    rng = np.random.RandomState(3)
    data = [
        (i, [float(x) for x in rng.randn(6)]) for i in range(40)
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    out = pca_power_project(df, "vec_id", "embedding", 6, k=2, iters=8)
    got = {(r["vec_id"], r["pos"]): r["val"] for r in out.collect()}
    C = covariance_as_matrix(df, "vec_id", "embedding", 6)
    comps, _ = pca_power_components(C, k=2, iters=8)
    for vid, vec in data:
        for p, comp in enumerate(comps, start=1):
            s = vec[0] * comp[0]
            for c in range(1, 6):
                s = s + vec[c] * comp[c]
            assert got[(vid, p)] == math.floor(s * 1e6 + 0.5) / 1e6


# ------------------------------------------------- production-width tier


def test_widen_vectors_matches_probe_recipe(spark):
    """The all-JVM tile+perturb derivation must equal the wide probe's
    numpy formula (tools/scale_probe.build_wide): tile t, coord i gets
    +0.001*(((t*31+i)%17)-8). Bit-exact: both sides compute the same
    double literals in the same order."""
    import numpy as np

    from mongo_analyser_spark.operators.pca import widen_vectors

    rng = np.random.RandomState(11)
    data = [(i, [float(x) for x in rng.randn(8)]) for i in range(10)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["wvec"]
        for r in widen_vectors(df, "vec_id", "embedding", 3).collect()
    }
    for vid, vec in data:
        want = []
        for t in range(3):
            for i, x in enumerate(vec):
                want.append(x + 0.001 * (((t * 31 + i) % 17) - 8))
        assert got[vid] == want


def test_pca_project_wide_recovers_planted_subspace(spark):
    """The fidelity gate (verdict-r13 #2, the ANN-recall discipline
    applied to subspace alignment): on a PLANTED low-rank spectrum at
    production width, PCA-in-JL-space run through the REAL operators
    must recover the JL image of the planted principal subspace —
    principal-angle cosines >= 0.95 and explained-variance share
    >= 0.9 (measured 0.9995+/0.969 on this seed; margins leave room
    for BLAS build drift, not for regressions). The fixture corpus's
    flat spectrum (top eigen-gap ~1%) can't express this gate — the
    TF-IDF Zipf-vocab lesson, SCALE.md:518 — hence the planted data."""
    import numpy as np

    from mongo_analyser_spark.operators.pca import (
        jl_planes,
        jl_project_arrow,
        pca_components,
    )

    rng = np.random.default_rng(7)
    d, n, k = 768, 400, 4
    B = np.linalg.qr(rng.standard_normal((d, k)))[0]
    G = rng.standard_normal((n, k)) * np.array([10.0, 8.0, 6.0, 5.0])
    X = G @ B.T + 0.1 * rng.standard_normal((n, d))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, wvec array<double>",
    )
    jdf = jl_project_arrow(df, "vec_id", "wvec", d, 64)
    comps, ratios = pca_components(jdf, "vec_id", "jvec", 64, k)
    P = np.array(jl_planes(64, d))
    W = np.array(comps)
    PB = np.linalg.qr(P @ B)[0]
    cosines = np.linalg.svd(W @ PB, compute_uv=False)
    assert cosines.min() >= 0.95, cosines
    assert sum(ratios) >= 0.9, ratios


def test_pca_project_wide_registry_row_consistent(spark):
    """The rows-only registry row's projections must equal a direct
    numpy recomputation through the same path (JL matmul -> eigh comps
    -> dot), pinning the declared-rows-only row to real math rather
    than just a row count."""
    import numpy as np

    from mongo_analyser_spark.queries import QUERIES
    from mongo_analyser_spark.operators.pca import (
        jl_project_arrow,
        pca_components,
    )
    from mongo_analyser_spark.queries_pipeline import (
        EMB_DIM,
        _PCA_K,
        _WIDE_DIM,
        _wide_embeddings,
    )

    sf = "/root/testdata/sf0.001"
    out = QUERIES["pca_project_wide_embeddings"](spark, sf).collect()
    wide = _wide_embeddings(spark, sf)
    jdf = jl_project_arrow(wide, "vec_id", "wvec", _WIDE_DIM, EMB_DIM)
    jrows = {r["vec_id"]: np.asarray(r["jvec"]) for r in jdf.collect()}
    comps, _ = pca_components(jdf, "vec_id", "jvec", EMB_DIM, _PCA_K)
    W = np.array(comps)
    # round 16: long form (vec_id, pos, val) — driver-canonicalizable
    # scalars only (verdict-r15 #1a); k rows per vector, 1-based pos
    assert len(out) == len(jrows) * _PCA_K
    for r in out[: 50 * _PCA_K]:
        want = np.round(W @ jrows[r["vec_id"]], 6)
        assert abs(r["val"] - want[r["pos"] - 1]) <= 1e-9, r
