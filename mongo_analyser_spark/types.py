"""Reference type-label system (SURVEY.md §1.2).

The reference infers a per-value type string with isinstance chains
(mongo_analyser/core/analyser.py:146-211 and core/extractor.py:35-89).
Two layers here:

1. ``ref_type_label(dtype)`` — static mapping Spark DataType → reference
   label, used when the substrate is already typed (parquet).
2. ``infer_value_type(value)`` — pure-Python per-value inference over
   JSON-decoded documents, reproducing the reference's observable rules:
   bool-before-int ordering, first-10-element array election with
   null-skip, ``array<mixed>``, ``array<empty>``, nested-dict recursion.
   Used for dynamic JSON document columns and unit-tested against the
   reference's truth tables (tests/core/test_extractor.py:30-58 shapes).

NOTE on ``int32``: the reference labels *every* plain Python int ``int32``
even when it exceeds 32 bits (core/analyser.py:174-175). We keep that label
for schema-parity APIs but use LongType physically (SURVEY §1.2).
"""

from __future__ import annotations

import datetime as _dt
import uuid as _uuid
from typing import Any

from pyspark.sql import types as T

# --- BSON binary-subtype lattice (core/shared.py:8-14) ---------------------
# Subtype 4 (standard UUID) is handled by extractor.py:54-58 before the map
# lookup in the reference; folded into the table here since the table IS the
# observable contract.

BINARY_TYPE_MAP = {
    0: "binary<generic>",
    1: "binary<function>",
    3: "binary<UUID (legacy)>",
    4: "binary<UUID>",
    5: "binary<MD5>",
}


class BsonBinary(bytes):
    """Plain-bytes stand-in for BSON Binary-with-subtype (this container
    has no bson package): ``BsonBinary(b"...", subtype=4)``. Any foreign
    object carrying bytes plus an int ``subtype`` attribute (e.g. a real
    ``bson.Binary``) is duck-typed identically by ``infer_value_type``."""

    def __new__(cls, data: bytes = b"", subtype: int = 0):
        obj = super().__new__(cls, data)
        obj.subtype = subtype
        return obj

# --- static Spark-type → reference-label mapping ---------------------------

_SIMPLE = {
    T.BooleanType: "bool",
    T.ByteType: "int32",
    T.ShortType: "int32",
    T.IntegerType: "int32",
    T.LongType: "int64",
    T.FloatType: "double",
    T.DoubleType: "double",
    T.StringType: "str",
    T.TimestampType: "datetime",
    T.TimestampNTZType: "datetime",
    T.DateType: "datetime",
    T.BinaryType: "binary<generic>",
    T.NullType: "null",
}


def ref_type_label(dtype: T.DataType) -> str:
    """Map a Spark DataType to the reference's type vocabulary."""
    for cls, label in _SIMPLE.items():
        if isinstance(dtype, cls):
            return label
    if isinstance(dtype, T.DecimalType):
        return "decimal128"
    if isinstance(dtype, T.ArrayType):
        return f"array<{ref_type_label(dtype.elementType)}>"
    if isinstance(dtype, (T.StructType, T.MapType)):
        return "dict"
    return f"unknown<{dtype.simpleString()}>"


# --- dynamic per-value inference (JSON-document substrate) -----------------


def infer_value_type(value: Any) -> str:
    """Reference-parity per-value type label for JSON-decoded values.

    Mirrors the observable contract of core/extractor.py:35-89:
    * bool checked before int (Python bool ⊂ int)
    * list election ignores None elements; one distinct type → array<T>,
      several → array<mixed>, none (all null) → array<null>, [] → array<empty>
    * dict → 'dict', None → 'null', unknown objects → 'unknown<TypeName>'
    """
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "bool"
    if isinstance(value, int):
        # reference labels plain ints int32, large ints int64 only when the
        # source was a BSON Int64; JSON has no such marker, so follow the
        # reference's plain-int rule (analyser.py:174-175).
        return "int32" if -(2**31) <= value < 2**31 else "int64"
    if isinstance(value, float):
        return "double"
    if isinstance(value, str):
        return "str"
    if isinstance(value, (_dt.datetime, _dt.date)):
        return "datetime"
    if isinstance(value, _uuid.UUID):
        return "UUID"
    if isinstance(value, (bytes, bytearray)):
        # BSON Binary carries a subtype (duck-typed: works for BsonBinary
        # here and for a real bson.Binary when one is around) →
        # binary<UUID> / binary<MD5> / ... per the subtype lattice
        # (extractor.py:53-58 + shared.py:8-14); plain bytes are subtype 0.
        subtype = getattr(value, "subtype", 0)
        if isinstance(subtype, int):
            return BINARY_TYPE_MAP.get(subtype, f"binary<subtype {subtype}>")
        return "binary<generic>"
    if isinstance(value, dict):
        return "dict"
    if isinstance(value, (list, tuple)):
        return _infer_array_type(list(value))
    # bson-specific classes matched by name so real BSON values label
    # correctly without a bson import (extractor.py:49-52, 84-85)
    tname = type(value).__name__
    if tname == "ObjectId":
        return "ObjectId"
    if tname == "Decimal128":
        return "decimal128"
    return f"unknown<{tname}>"


def _infer_array_type(arr: list[Any]) -> str:
    if not arr:
        return "array<empty>"
    # schema election looks at only the first 10 elements
    # (analyser.py:94 `value[:10]`), and skips nulls (extractor.py:71-81).
    elem_types = {infer_value_type(v) for v in arr[:10] if v is not None}
    if not elem_types:
        return "array<null>"
    if len(elem_types) == 1:
        return f"array<{elem_types.pop()}>"
    return "array<mixed>"


def flatten_document(doc: dict, prefix: str = "") -> dict[str, Any]:
    """Flatten nested dicts into dotted paths (analyser.py:44-45)."""
    out: dict[str, Any] = {}
    for key, val in doc.items():
        full = f"{prefix}.{key}" if prefix else key
        if isinstance(val, dict):
            out.update(flatten_document(val, full))
        else:
            out[full] = val
    return out


def schema_to_hierarchical(flat_schema: dict[str, dict]) -> dict:
    """Rebuild the nested schema form by splitting dotted paths
    (analyser.py:324-333)."""
    root: dict = {}
    for path, meta in flat_schema.items():
        node = root
        parts = path.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = meta
    return root
