"""Conversion truth table (shapes from /root/reference
tests/core/test_extractor.py:60-134): tz-aware ISO export, UUID
canonicalization, hex, truncation, byte humanization."""

import datetime as dt
import uuid

from pyspark.sql import Row
from pyspark.sql import functions as F

from mongo_analyser_spark.functions.conversion import (
    binary_hex,
    display_safe,
    humanize_bytes,
    iso_timestamp,
    truncate_with_ellipsis,
    uuid_canonical,
)


def one(spark, value, expr, schema=None):
    df = spark.createDataFrame([Row(v=value)], schema=schema)
    return df.select(expr.alias("out")).collect()[0]["out"]


def test_iso_timestamp_oslo(spark):
    # the reference's Europe/Oslo case: naive 12:00 UTC → 13:00+01:00
    # (tests/core/test_extractor.py:75-76 behavior)
    out = one(spark, dt.datetime(2023, 1, 1, 12, 0, 0), iso_timestamp(F.col("v"), "Europe/Oslo"))
    assert out == "2023-01-01T13:00:00+01:00"


def test_iso_timestamp_utc_suffix(spark):
    out = one(spark, dt.datetime(2023, 1, 1, 12, 0, 0), iso_timestamp(F.col("v"), "UTC"))
    assert out == "2023-01-01T12:00:00+00:00"


def test_binary_hex(spark):
    out = one(spark, bytearray(b"\xde\xad\xbe\xef"), binary_hex(F.col("v")), "v binary")
    assert out == "deadbeef"


def test_uuid_canonical(spark):
    u = uuid.UUID("123e4567-e89b-12d3-a456-426614174000")
    out = one(spark, bytearray(u.bytes), uuid_canonical(F.col("v")), "v binary")
    assert out == str(u)


def test_truncate_with_ellipsis(spark):
    assert one(spark, "x" * 120, truncate_with_ellipsis(F.col("v"), 100)) == "x" * 100 + "..."
    assert one(spark, "short", truncate_with_ellipsis(F.col("v"), 100)) == "short"


def test_display_safe_too_large(spark):
    out = one(spark, "y" * 501, display_safe(F.col("v"), "str"))
    assert out == "str(too large to display inline)"


def test_humanize_bytes(spark):
    assert one(spark, 512, humanize_bytes(F.col("v")), "v long") == "512.0 B"
    assert one(spark, 1024, humanize_bytes(F.col("v")), "v long") == "1.0 KB"
    assert one(spark, 1536, humanize_bytes(F.col("v")), "v long") == "1.5 KB"
    assert one(spark, 5 * 1024**3, humanize_bytes(F.col("v")), "v long") == "5.0 GB"


def test_export_select_recursive(spark):
    """Generic schema-directed export (extractor.py:91-246): timestamps,
    binary, decimal, arrays and nested structs all converted in one
    projection."""
    import datetime
    import uuid as uuid_mod
    from decimal import Decimal

    from pyspark.sql import types as T

    from mongo_analyser_spark.functions.conversion import export_select

    u = uuid_mod.UUID("12345678-1234-5678-1234-567812345678")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("when", T.TimestampType()),
            T.StructField("blob", T.BinaryType()),
            T.StructField("uid", T.BinaryType()),
            T.StructField("amount", T.DecimalType(10, 2)),
            T.StructField("times", T.ArrayType(T.TimestampType())),
            T.StructField(
                "nested",
                T.StructType([T.StructField("inner_blob", T.BinaryType())]),
            ),
        ]
    )
    ts = datetime.datetime(2023, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [(1, ts, b"\xde\xad\xbe\xef", u.bytes, Decimal("50.25"), [ts], (b"\x01",))],
        schema,
    )
    row = export_select(
        df, tz="Europe/Oslo", type_overrides={"uid": "binary<UUID>"}
    ).collect()[0]
    assert row["when"] == "2023-01-01T13:00:00+01:00"  # the reference's Oslo case
    assert row["blob"] == "deadbeef"
    assert row["uid"] == str(u)
    assert row["amount"] == "50.25"
    assert row["times"] == ["2023-01-01T13:00:00+01:00"]
    assert row["nested"]["inner_blob"] == "01"


def test_export_select_then_gz_roundtrip(spark, tmp_path):
    """Full reference export pipeline: schema-directed conversion ->
    gzip JSON-array sink -> parse back."""
    import gzip
    import json

    from mongo_analyser_spark.functions.conversion import export_select
    from mongo_analyser_spark.sinks import export_json_array_gz
    from mongo_analyser_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").limit(3)
    out = str(tmp_path / "events.json.gz")
    n = export_json_array_gz(export_select(ev, tz="UTC").orderBy("event_id"), out)
    docs = json.loads(gzip.open(out, "rt").read())
    assert len(docs) == n == 3
    assert docs[0]["ts"].endswith("+00:00")
