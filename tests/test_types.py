"""Reference type-inference truth tables (shapes from
/root/reference tests/core/test_extractor.py:30-58 and
tests/core/test_analyser.py — re-asserted, not copied)."""

import datetime as dt

import pytest

from mongo_analyser_spark.types import (
    flatten_document,
    infer_value_type,
    ref_type_label,
    schema_to_hierarchical,
)
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.mark.parametrize(
    "value,expected",
    [
        (True, "bool"),  # bool BEFORE int (Python bool ⊂ int)
        (False, "bool"),
        (30, "int32"),
        (1234567890123, "int64"),
        (4.5, "double"),
        ("test", "str"),
        (None, "null"),
        (dt.datetime(2023, 1, 1, 12), "datetime"),
        (b"\x01\x02\x03", "binary<generic>"),
        ({"a": 1}, "dict"),
        ([], "array<empty>"),
        ([10, 20, 10], "array<int32>"),
        ([1, "a", True], "array<mixed>"),
        ([{"id": 1}, {"id": 2}], "array<dict>"),
        ([1, None], "array<int32>"),  # election ignores nulls
        ([None, None], "array<null>"),
        ([1] * 10 + ["tail-ignored"], "array<int32>"),  # first-10 election
    ],
)
def test_infer_value_type(value, expected):
    assert infer_value_type(value) == expected


@pytest.mark.parametrize(
    "dtype,expected",
    [
        (T.BooleanType(), "bool"),
        (T.IntegerType(), "int32"),
        (T.LongType(), "int64"),
        (T.DoubleType(), "double"),
        (T.FloatType(), "double"),
        (T.StringType(), "str"),
        (T.TimestampType(), "datetime"),
        (T.DecimalType(38, 2), "decimal128"),
        (T.BinaryType(), "binary<generic>"),
        (T.ArrayType(T.LongType()), "array<int64>"),
        (T.StructType([]), "dict"),
        (T.MapType(T.StringType(), T.StringType()), "dict"),
    ],
)
def test_ref_type_label(dtype, expected):
    assert ref_type_label(dtype) == expected


def test_flatten_document():
    doc = {"user": {"name": "tester", "details": {"age": 25}}, "x": 1}
    assert flatten_document(doc) == {
        "user.name": "tester",
        "user.details.age": 25,
        "x": 1,
    }


def test_schema_to_hierarchical_roundtrip():
    flat = {
        "user.name": {"type": "str"},
        "user.details.age": {"type": "int32"},
        "x": {"type": "int32"},
    }
    assert schema_to_hierarchical(flat) == {
        "user": {"name": {"type": "str"}, "details": {"age": {"type": "int32"}}},
        "x": {"type": "int32"},
    }


def test_registry_every_query_has_oracle():
    """Driver-contract meta-check: every queries() entry ships a DuckDB
    oracle twin EXCEPT the declared approximate-sketch variants, whose
    answers are not SQL-reproducible by design (they get the weaker
    rows-only check plus pytest accuracy bounds vs their exact twins —
    the full policy lives in tests/test_registry.py)."""
    from mongo_analyser_spark.queries import ORACLES, QUERIES
    from tests.test_registry import ROWS_ONLY

    assert set(QUERIES) - set(ORACLES) == ROWS_ONLY
    assert len(QUERIES) >= 50


def test_load_table_missing_is_friendly(spark):
    import pytest as _pytest

    from mongo_analyser_spark.sources.parquet import load_table

    with _pytest.raises(FileNotFoundError, match="available.*events"):
        load_table(spark, "/root/testdata/sf0.001", "nope")


# --- binary-subtype lattice (port of tests/core/test_extractor.py:30-58
# binary rows + shared.py:8-14 map) ---------------------------------------

import uuid as _uuid

from mongo_analyser_spark.types import BINARY_TYPE_MAP, BsonBinary


@pytest.mark.parametrize(
    "value, expected",
    [
        (_uuid.uuid4(), "UUID"),
        (BsonBinary(b"\x01", subtype=3), "binary<UUID (legacy)>"),
        (BsonBinary(b"\x01" * 16, subtype=4), "binary<UUID>"),
        (BsonBinary(b"\x01", subtype=0), "binary<generic>"),
        (BsonBinary(b"\x01", subtype=5), "binary<MD5>"),
        (BsonBinary(b"\x01", subtype=1), "binary<function>"),
        (BsonBinary(b"\x01", subtype=99), "binary<subtype 99>"),
        (b"raw", "binary<generic>"),
        (bytearray(b"raw"), "binary<generic>"),
    ],
)
def test_infer_binary_subtypes(value, expected):
    from mongo_analyser_spark.types import infer_value_type

    assert infer_value_type(value) == expected


def test_objectid_and_decimal128_by_type_name():
    """bson classes label correctly without a bson import (duck-typed on
    the class NAME, extractor.py:49-52,84-85)."""
    from mongo_analyser_spark.types import infer_value_type

    ObjectId = type("ObjectId", (), {})
    Decimal128 = type("Decimal128", (), {})
    assert infer_value_type(ObjectId()) == "ObjectId"
    assert infer_value_type(Decimal128()) == "decimal128"


def test_binary_type_map_matches_reference_table():
    assert BINARY_TYPE_MAP == {
        0: "binary<generic>",
        1: "binary<function>",
        3: "binary<UUID (legacy)>",
        4: "binary<UUID>",
        5: "binary<MD5>",
    }


def test_export_select_honors_inferred_schema_artifact(spark):
    """A binary<UUID> label straight from inference converts to canonical
    UUID with NO manual type_overrides (round-1 Missing #4)."""
    from mongo_analyser_spark.functions.conversion import export_select

    raw = bytes.fromhex("0123456789abcdef0123456789abcdef")
    df = spark.createDataFrame([(raw,), (None,)], "u binary")
    artifact = {"u": {"type": "binary<UUID>"}}  # as Engine.infer_schema emits
    rows = export_select(df, schema_artifact=artifact).orderBy(F.col("u").asc_nulls_last()).collect()
    assert rows[0].u == "01234567-89ab-cdef-0123-456789abcdef"
    assert rows[1].u is None
    # explicit overrides still win over the artifact
    rows2 = export_select(
        df, type_overrides={"u": "binary<generic>"}, schema_artifact=artifact
    ).collect()
    assert all(r.u is None or "-" not in r.u for r in rows2)
