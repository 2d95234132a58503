"""Field-stats engine vs the reference's sampling contract
(shape of /root/reference tests/core/test_analyser.py:192-256 and
FIXTURES.md §1.4): 3 documents → cardinality, missing%, top values,
min/max, type distribution."""

import pytest

from pyspark.sql import types as T

from mongo_analyser_spark.engine import Engine
from mongo_analyser_spark.operators.field_stats import (
    array_element_stats,
    field_stats,
    top_values,
    type_histogram,
)

SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("value", T.LongType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField(
            "info", T.StructType([T.StructField("valid", T.BooleanType())])
        ),
    ]
)

DOCS = [
    ("A", 10, ["x"], None),
    ("B", 20, None, (True,)),
    ("A", 15, ["x", "y"], None),
]


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def test_field_stats_sampling_contract(spark, sample_df):
    rows = {r["field"]: r for r in field_stats(sample_df).collect()}
    assert rows["name"]["cnt"] == 3
    assert rows["name"]["distinct_cnt"] == 2
    assert rows["name"]["missing_pct"] == 0.0
    assert rows["value"]["min_num"] == 10.0
    assert rows["value"]["max_num"] == 20.0
    assert rows["tags"]["cnt"] == 2
    assert rows["tags"]["missing_pct"] == pytest.approx(100 / 3, abs=1e-3)
    assert rows["info.valid"]["cnt"] == 1


def test_top_values(spark, sample_df):
    tv = {(r["field"], r["value"]): r["cnt"] for r in top_values(sample_df).collect()}
    assert tv[("name", "A")] == 2
    assert tv[("name", "B")] == 1
    # ints must NOT enter value frequencies (reference
    # tests/core/test_analyser.py:124-125 behavior)
    assert not any(f == "value" for f, _ in tv)


def test_type_histogram(spark, sample_df):
    hist = {(r["field"], r["type_tag"]): r["cnt"] for r in type_histogram(sample_df).collect()}
    assert hist[("name", "str")] == 3
    assert hist[("info.valid", "bool")] == 1
    assert hist[("info.valid", "null")] == 2
    assert hist[("tags", "array<str>")] == 2


def test_array_element_stats(spark, sample_df):
    r = array_element_stats(sample_df, "tags").collect()[0]
    assert r["field"] == "tags[]"
    assert r["cnt"] == 3  # all elements, both docs
    assert r["distinct_cnt"] == 2


def test_engine_analyze_shapes(spark, sample_df):
    out = Engine(spark).analyze(sample_df)
    assert out["name"]["count"] == 3
    assert out["name"]["cardinality"] == 2
    assert out["name"]["top_values"] == {"A": 2, "B": 1}
    assert out["value"]["min"] == 10.0
    assert out["value"]["max"] == 20.0
    assert out["info.valid"]["type_distribution"] == {"null": 2, "bool": 1}
    assert list(out) == sorted(out)


def test_engine_infer_schema(spark, sample_df):
    sch = Engine(spark).infer_schema(sample_df)
    assert sch["name"] == {"type": "str"}
    assert sch["value"] == {"type": "int64"}
    assert sch["tags"] == {"type": "array<str>"}
    assert sch["info"] == {"type": "dict"}
    assert sch["info.valid"] == {"type": "bool"}


def test_field_stats_all_null_column(spark):
    from mongo_analyser_spark.operators.field_stats import field_stats

    df = spark.createDataFrame([(1, None), (2, None)], "a int, b string")
    rows = {r["field"]: r for r in field_stats(df).collect()}
    assert rows["b"]["cnt"] == 0
    assert rows["b"]["missing_pct"] == 100.0
    assert rows["b"]["distinct_cnt"] == 0
    assert rows["a"]["missing_pct"] == 0.0


def test_field_stats_empty_input(spark):
    from mongo_analyser_spark.operators.field_stats import field_stats

    df = spark.createDataFrame([], "a int, b string")
    assert field_stats(df).collect() == []


def test_engine_analyze_empty_is_empty(spark):
    from mongo_analyser_spark.engine import Engine

    df = spark.createDataFrame([], "a int")
    assert Engine(spark).analyze(df) == {}


def test_engine_sample_exact_n_seeded(spark):
    """Engine.sample: exact-N uniform random ($sample parity,
    analyser.py:254-257). Seeded runs are reproducible; the plan is
    TakeOrderedAndProject (per-partition top-n, no global sort)."""
    from mongo_analyser_spark.engine import Engine
    from mongo_analyser_spark.plans import formatted_plan
    from mongo_analyser_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    s1 = Engine.sample(ev, 37, seed=7)
    assert s1.count() == 37
    assert "TakeOrderedAndProject" in formatted_plan(s1)
    ids1 = sorted(r.event_id for r in s1.collect())
    ids2 = sorted(r.event_id for r in Engine.sample(ev, 37, seed=7).collect())
    assert ids1 == ids2
    # a different seed draws a different sample (overwhelmingly likely:
    # P(identical 37-of-1000 draw) < 1e-50)
    ids3 = sorted(r.event_id for r in Engine.sample(ev, 37, seed=8).collect())
    assert ids1 != ids3


def test_engine_sample_fraction_binomial_bounds(spark):
    """df.sample(fraction): count within generous binomial bounds
    (n=1000, p=0.2 → mean 200, sd ~12.6; ±6 sd)."""
    from mongo_analyser_spark.engine import Engine
    from mongo_analyser_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    cnt = Engine.sample_fraction(ev, 0.2, seed=42).count()
    assert 124 <= cnt <= 276, cnt


def test_engine_honors_config_sample_size(spark, tmp_path):
    """With a ConfigManager attached, analyze defaults to the configured
    sample size (reference config_manager.py:30 default-1000 behavior);
    without one, full scan."""
    from mongo_analyser_spark.config import ConfigManager
    from mongo_analyser_spark.engine import Engine
    from mongo_analyser_spark.sources.parquet import load_table

    cm = ConfigManager(base_app_data_dir_override=tmp_path / "app")
    cm.update_setting("schema_analysis_default_sample_size", 100)
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select("event_id")
    stats = Engine(spark, config=cm).analyze(ev)
    assert stats["event_id"]["count"] == 100
    assert Engine(spark).analyze(ev)["event_id"]["count"] == 1000
    # explicit arg still wins over config
    assert Engine(spark, config=cm).analyze(ev, sample_size=7)["event_id"]["count"] == 7


def test_sketch_variants_agree_with_exact_twins(spark):
    """Rows-only sketch queries: HLL cardinality within 5% of exact,
    approx_percentile within 1% of exact — the accuracy contract that
    replaces their missing SQL oracle."""
    from mongo_analyser_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact_fs = {r["field"]: r for r in QUERIES["field_stats_events"](spark, sf).collect()}
    hll_fs = {r["field"]: r for r in QUERIES["field_stats_events_hll"](spark, sf).collect()}
    assert set(exact_fs) == set(hll_fs)
    for f in exact_fs:
        e, a = exact_fs[f]["distinct_cnt"], hll_fs[f]["distinct_cnt"]
        assert abs(a - e) <= max(2, 0.05 * e), (f, e, a)

    # approx_percentile returns DISCRETE order statistics (no
    # interpolation), so the right exact reference is approx_percentile
    # at effectively-infinite accuracy, not the interpolating percentile()
    from mongo_analyser_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf, "events")
    disc = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            *[
                F.round(F.expr(f"approx_percentile(value, {p}, 100000000)"), 4).alias(c)
                for p, c in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
            ]
        )
        .collect()
    }
    approx_p = {r.event_type: r for r in QUERIES["value_percentiles_events_approx"](spark, sf).collect()}
    for t in disc:
        for col in ("p50", "p90", "p99"):
            e, a = disc[t][col], approx_p[t][col]
            # accuracy 10000 on n≈250/group ⇒ rank error ~0: exact match
            assert a == e, (t, col, e, a)


def test_distinct_kmv_exact_below_capacity_and_estimates_above(spark):
    """Below k distinct values the sketch IS the exact count; above, the
    (k-1)/h_k estimate lands within the KMV error contract (sd ~
    1/sqrt(k-2) ~ 12.7% for k=64; md5 is deterministic so this is a
    fixed value, bounded generously at 3 sigma)."""
    import pytest as _pytest

    from mongo_analyser_spark.operators.field_stats import distinct_kmv

    rows = [("small", f"v{i % 10}") for i in range(50)] + [
        ("big", f"u{i}") for i in range(1000)
    ]
    # NULL values must be excluded BEFORE hashing (review finding: the
    # NULL hash sorts NULLS FIRST in Spark but NULLS LAST in DuckDB,
    # silently biasing h_k) — a null row must change nothing
    rows.append(("small", None))
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r.g: r for r in distinct_kmv(df, "g", "v", k=64).collect()}
    assert got["small"].n_exact == 10
    assert got["small"].kmv_estimate == 10.0  # exact below capacity
    assert got["big"].n_exact == 1000
    assert abs(got["big"].kmv_estimate - 1000) < 380  # 3 sigma
    with _pytest.raises(ValueError):
        distinct_kmv(df, "g", "v", k=1)
