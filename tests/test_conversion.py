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
