"""Type-directed value conversion — the reference's export path
(mongo_analyser/core/extractor.py:91-246 `_convert_single_value` /
`convert_to_json_compatible`) re-expressed as Column expressions,
plus the display-safe truncation rules (extractor.py:396-451).

All of these stay inside whole-stage codegen: no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ISO-8601 with offset, the reference's export format
#: (extractor.py:179-186: naive datetimes assumed UTC, converted to tz,
#: emitted with offset suffix like '2023-01-01T13:00:00+01:00').
ISO_OFFSET_FMT = "yyyy-MM-dd'T'HH:mm:ssXXX"


def iso_timestamp(col: Column | str, tz: str = "UTC") -> Column:
    """Naive-UTC timestamp → tz-converted ISO-8601 string with offset.

    The offset suffix is computed from the actual shift (date_format's
    'XXX' would render the SESSION timezone's offset, not the target's),
    and zero renders '+00:00' like Python's datetime.isoformat() — the
    reference's export format (extractor.py:179-186).
    """
    c = F.col(col) if isinstance(col, str) else col
    local = F.from_utc_timestamp(c, tz)
    diff = local.cast("long") - c.cast("long")
    adiff = F.abs(diff)
    suffix = F.concat(
        F.when(diff < 0, F.lit("-")).otherwise(F.lit("+")),
        F.lpad((adiff / 3600).cast("int").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(((adiff % 3600) / 60).cast("int").cast("string"), 2, "0"),
    )
    return F.concat(F.date_format(local, "yyyy-MM-dd'T'HH:mm:ss"), suffix)


def local_timestamp(col: Column | str, tz: str) -> Column:
    """Naive-UTC timestamp → tz-local wall-clock string (no offset) —
    the cross-engine-comparable form of the conversion."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.from_utc_timestamp(c, tz), "yyyy-MM-dd'T'HH:mm:ss")


def binary_hex(col: Column | str) -> Column:
    """bytes → lowercase hex (extractor.py:154,199-200)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.hex(c))


def uuid_canonical(col: Column | str) -> Column:
    """16-byte binary → canonical 8-4-4-4-12 UUID string
    (extractor.py:131-170, standard subtype-4 layout)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.lower(F.hex(c))
    # F.concat (not concat_ws): concat_ws silently drops null arguments,
    # turning a NULL input into '' instead of NULL
    dash = F.lit("-")
    return F.concat(
        F.substring(h, 1, 8), dash,
        F.substring(h, 9, 4), dash,
        F.substring(h, 13, 4), dash,
        F.substring(h, 17, 4), dash,
        F.substring(h, 21, 12),
    )


def truncate_with_ellipsis(col: Column | str, n: int) -> Column:
    """Reference display truncation: cap at n chars + '...'
    (schema_analysis_view.py:389-393 and extractor.py:419-426)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) > n, F.concat(F.substring(c, 1, n), F.lit("..."))).otherwise(c)


def display_safe(col: Column | str, type_name: str = "str", max_serialized: int = 500) -> Column:
    """The reference's >500-char guard: values whose serialized form
    exceeds the cap render as '<type>(too large to display inline)'
    (extractor.py:430-439)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > max_serialized,
        F.lit(f"{type_name}(too large to display inline)"),
    ).otherwise(c)


def export_expr(
    dtype,
    col: Column,
    tz: str = "UTC",
    path: str = "",
    type_overrides: dict[str, str] | None = None,
) -> Column:
    """Recursive type-directed conversion expression — the generic form of
    the reference's `_convert_single_value`/`convert_to_json_compatible`
    walk (extractor.py:91-246): timestamps → tz-converted ISO strings,
    binary → hex (or canonical UUID when the schema artifact says
    `binary<UUID>`), decimals → strings, arrays/structs recursed.

    ``type_overrides`` maps dotted paths to reference type labels, letting
    an inferred-schema artifact direct conversions the physical type can't
    express (exactly how the reference passes schema-for-level down)."""
    from pyspark.sql import types as T

    overrides = type_overrides or {}
    label = overrides.get(path)
    if isinstance(dtype, T.TimestampType):
        return iso_timestamp(col, tz)
    if isinstance(dtype, T.BinaryType):
        if label in ("binary<UUID>", "binary<UUID (legacy)>"):
            return uuid_canonical(col)
        return binary_hex(col)
    if isinstance(dtype, T.DecimalType):
        return col.cast("string")
    if isinstance(dtype, T.ArrayType):
        sub = f"{path}[]" if path else "[]"
        return F.transform(
            col, lambda x: export_expr(dtype.elementType, x, tz, sub, overrides)
        )
    if isinstance(dtype, T.StructType):
        return F.struct(
            *[
                export_expr(
                    f.dataType,
                    col.getField(f.name),
                    tz,
                    f"{path}.{f.name}" if path else f.name,
                    overrides,
                ).alias(f.name)
                for f in dtype.fields
            ]
        )
    return col


def export_select(
    df, tz: str = "UTC", type_overrides: dict[str, str] | None = None,
    schema_artifact: dict[str, dict] | None = None,
):
    """Apply `export_expr` to every column — the whole-document export
    projection (extractor.py:210-246), one select, fully codegen.

    ``schema_artifact`` accepts an inferred flat schema straight from
    ``Engine.infer_schema``/``infer_schema_dynamic`` ({path: {"type":
    label}}), so a `binary<UUID>` elected by inference converts to a
    canonical UUID string without the caller hand-writing overrides —
    the reference's schema-directed export wiring (extractor.py:210-246
    passes the inferred schema down as schema-for-level)."""
    overrides = dict(type_overrides or {})
    for path, meta in (schema_artifact or {}).items():
        overrides.setdefault(path, meta.get("type") if isinstance(meta, dict) else meta)
    return df.select(
        *[
            export_expr(f.dataType, F.col(f.name), tz, f.name, overrides).alias(
                f.name
            )
            for f in df.schema.fields
        ]
    )


def humanize_bytes(col: Column | str) -> Column:
    """log-1024 bucketing into B..EB with 2-decimal rounding
    (views/db_connection_view.py:676-699)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    units = F.array(*[F.lit(u) for u in ["B", "KB", "MB", "GB", "TB", "PB", "EB"]])
    idx = F.when(c <= 0, F.lit(0)).otherwise(
        F.least(F.floor(F.log(1024.0, c)).cast("int"), F.lit(6))
    )
    scaled = F.round(c / F.pow(F.lit(1024.0), idx.cast("double")), 2)
    return F.concat(scaled.cast("string"), F.lit(" "), F.element_at(units, idx + 1))
