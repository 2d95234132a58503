"""Live MongoDB source via the MongoDB Spark connector (SURVEY §2.1 S12,
§7.2 M8). Optional: the connector jar isn't bundled in this environment,
so everything here except `MongoSource.load` is pure option/URI plumbing
that works (and is tested) without it; `load` raises a clear error when
the connector is absent.

Reference behavior being reproduced (not code): connection-profile
handling (mongo_analyser/core/db.py:20-187), URI construction/redaction
(core/shared.py:17-52), and the reference's server-side pushdowns —
`$sample` sampling (core/analyser.py:254-257) and sort+limit newest-N
(core/extractor.py:292-298,386-393) — shipped to the connector as an
`aggregation.pipeline` read option so MongoDB, not Spark, executes them.
"""

from __future__ import annotations

import json
from urllib.parse import quote_plus, urlsplit

from pyspark.sql import DataFrame, SparkSession

MONGO_FORMAT = "mongodb"


def build_mongo_uri(
    host: str,
    port: int | str,
    username: str | None = None,
    password: str | None = None,
    params: str | None = None,
) -> str:
    """mongodb:// URI with quote_plus-escaped credentials — same contract
    as the reference (core/shared.py:17-32; truth table in
    tests/core/test_shared.py)."""
    auth = ""
    if username:
        auth = quote_plus(username)
        if password:
            auth += f":{quote_plus(password)}"
        auth += "@"
    query = f"?{params}" if params else ""
    return f"mongodb://{auth}{host}:{port}/{query}"


def redact_uri_password(uri: str) -> str:
    """Mask the password component for logs/UI (core/shared.py:35-52).
    Returns the input unchanged when there is no user:pass@ section."""
    try:
        parts = urlsplit(uri)
        if not parts.password:
            return uri
        userinfo, host = parts.netloc.rsplit("@", 1)
        user = userinfo.split(":", 1)[0]
        return uri.replace(parts.netloc, f"{user}:********@{host}", 1)
    except ValueError:
        return uri


#: reference type labels accepted by read_mongoexport_json
_EXT_JSON_LABELS = (
    "ObjectId", "str", "bool", "int32", "int64", "double", "datetime",
    "decimal128", "UUID", "binary<generic>", "binary<UUID>", "dict", "array",
)


def _ext_json_expr(v, field: str, label: str):
    """Column expression extracting ``field`` from a parse_json variant of
    one Extended-JSON-v2 document, honoring the BSON type wrapper for
    ``label`` and falling back to the plain-JSON form (mongoexport emits
    either depending on --jsonFormat). Same type vocabulary as
    types.infer_value_type; conversions match the reference's export rules
    (core/extractor.py:91-246: ObjectId→hex str, datetime→timestamp,
    Decimal128→decimal string, binary UUID→canonical string)."""
    from pyspark.sql import functions as F

    from mongo_analyser_spark.functions.conversion import uuid_canonical

    def vg(path, t="string"):
        return F.try_variant_get(v, path, t)

    f = f"$.{field}"
    if label == "ObjectId":
        return F.coalesce(vg(f"{f}.$oid"), vg(f))
    if label == "str":
        return vg(f)
    if label == "bool":
        return vg(f, "boolean")
    if label == "int32":
        return F.coalesce(vg(f"{f}.$numberInt").cast("int"), vg(f, "int"))
    if label == "int64":
        return F.coalesce(vg(f"{f}.$numberLong").cast("long"), vg(f, "bigint"))
    if label == "double":
        return F.coalesce(vg(f"{f}.$numberDouble").cast("double"), vg(f, "double"))
    if label == "datetime":
        # try_cast: under ANSI mode a plain cast would throw on the
        # OTHER wrapper form (the coalesce probes both)
        return F.coalesce(
            vg(f"{f}.$date").try_cast("timestamp"),  # ISO-8601 form
            F.timestamp_millis(vg(f"{f}.$date.$numberLong").try_cast("long")),
            vg(f).try_cast("timestamp"),
        )
    if label == "decimal128":
        return F.coalesce(vg(f"{f}.$numberDecimal"), vg(f)).try_cast("decimal(38,10)")
    if label == "UUID":
        # either ext-JSON form: $uuid string (bson.py, mongoexport
        # --jsonFormat=canonical with UUID subtype) or base64 $binary
        return F.coalesce(
            vg(f"{f}.$uuid"),
            uuid_canonical(F.unbase64(vg(f"{f}.$binary.base64"))),
        )
    if label == "binary<UUID>":
        return F.coalesce(
            uuid_canonical(F.unbase64(vg(f"{f}.$binary.base64"))),
            vg(f"{f}.$uuid"),
        )
    if label.startswith("binary"):
        return F.unbase64(F.coalesce(vg(f"{f}.$binary.base64"), vg(f"{f}.$binary")))
    if label.startswith("array<"):
        # scalar element types extract as TYPED arrays; anything else
        # (array<dict>, array<mixed>) surfaces as a JSON string
        ddl = {
            "int32": "array<int>",
            "int64": "array<bigint>",
            "double": "array<double>",
            "bool": "array<boolean>",
            "str": "array<string>",
        }.get(label[len("array<"):-1])
        if ddl:
            return vg(f, ddl)
        return F.to_json(vg(f, "variant"))
    if label in ("dict", "array"):
        return F.to_json(vg(f, "variant"))
    raise ValueError(f"unsupported Extended JSON label {label!r} for {field!r}")


def read_mongoexport_json(
    spark: SparkSession,
    path: str,
    fields: dict[str, str],
    corrupt_col: str | None = None,
) -> DataFrame:
    """Offline Mongo ingestion WITHOUT the connector jar: read a
    mongoexport / mongodump Extended-JSON (v2) ndjson dump into typed
    columns (SURVEY §2.1 S12 — the dump-file complement to the live
    `MongoSource`; at 100 TB bulk dumps land on object storage and this
    path is how they enter Spark).

    ``fields`` maps column name → reference type label (the §1.2
    vocabulary). Engine-side throughout: one text scan, try_parse_json
    to VariantType, per-field try_variant_get projections — no Python in
    the row path, splittable input, whole-stage codegen.

    Malformed lines must not kill a 100-TB ingest: unparseable JSON
    yields all-NULL typed columns (try_parse_json), and passing
    ``corrupt_col`` additionally keeps the raw line there (NULL for good
    rows) — the PERMISSIVE-mode contract, so bad records are countable
    and quarantineable instead of fatal."""
    return project_ext_json_lines(spark.read.text(path), fields, corrupt_col)


def project_ext_json_lines(
    lines: DataFrame, fields: dict[str, str], corrupt_col: str | None = None
) -> DataFrame:
    """Shared Extended-JSON projection: a one-column (``value`` string)
    DataFrame of ext-JSON documents → typed columns. Both dump formats
    (mongoexport ndjson and raw mongodump BSON via sources/bson.py) feed
    this same expression tree, which is what makes them hash-identical
    for the same documents."""
    from pyspark.sql import functions as F

    v = F.try_parse_json(F.col("value"))
    cols = [
        _ext_json_expr(v, name, label).alias(name) for name, label in fields.items()
    ]
    if corrupt_col is not None:
        cols.append(
            F.when(v.isNull(), F.col("value")).alias(corrupt_col)
        )
    return lines.select(*cols)


class MongoSource:
    """Builder for a connector read with reference-style pushdowns.

    The aggregation pipeline is executed BY THE MONGODB SERVER before
    rows reach Spark — the scale contract for live mode: sampling and
    newest-N never transfer the full collection. Filters/projections on
    the resulting DataFrame additionally push down via the connector's
    own $match/$project translation.
    """

    def __init__(self, uri: str, database: str, collection: str):
        self.uri = uri
        self.database = database
        self.collection = collection
        self.pipeline: list[dict] = []

    # -- pushdown stages (reference-issued query shapes) ------------------

    def sample(self, n: int) -> "MongoSource":
        """Server-side uniform sample — the reference's schema-inference
        scan (`$sample`, analyser.py:254-257)."""
        self.pipeline.append({"$sample": {"size": int(n)}})
        return self

    def newest(self, n: int | None, by: str = "_id") -> "MongoSource":
        """Sort newest-first (+ optional limit) — the reference's export
        and explorer scans (extractor.py:292-298,386-393)."""
        self.pipeline.append({"$sort": {by: -1}})
        if n is not None:
            self.pipeline.append({"$limit": int(n)})
        return self

    def match(self, predicate: dict) -> "MongoSource":
        self.pipeline.append({"$match": predicate})
        return self

    # -- materialization ---------------------------------------------------

    def options(self) -> dict[str, str]:
        opts = {
            "connection.uri": self.uri,
            "database": self.database,
            "collection": self.collection,
        }
        if self.pipeline:
            opts["aggregation.pipeline"] = json.dumps(self.pipeline)
        return opts

    def load(self, spark: SparkSession, schema=None) -> DataFrame:
        reader = spark.read.format(MONGO_FORMAT).options(**self.options())
        if schema is not None:
            reader = reader.schema(schema)
        try:
            return reader.load()
        except Exception as e:  # connector jar absent in this environment
            raise RuntimeError(
                "MongoDB Spark connector not available — add "
                "org.mongodb.spark:mongo-spark-connector to spark.jars.packages "
                f"(underlying error: {e})"
            ) from e

    def __repr__(self) -> str:  # never leak credentials into logs
        return (
            f"MongoSource({redact_uri_password(self.uri)}, "
            f"{self.database}.{self.collection}, stages={len(self.pipeline)})"
        )
