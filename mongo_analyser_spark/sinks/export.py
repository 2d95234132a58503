"""Export sinks (SURVEY §2.1 S5-S8).

The reference streams converted documents into ONE gzip-compressed JSON
array with `[\\n doc,\\n doc \\n]\\n` framing
(mongo_analyser/core/extractor.py:248-359, write loop :307-335) and dumps
schema/stats artifacts as JSON/CSV
(views/schema_analysis_view.py:448-479,517-546).

Two export tiers, because the reference's single-array framing is
inherently single-writer:

* `export_json` — the 100-TB path: parallel `df.write.json` (JSON Lines,
  one shard per task, optional gzip). This is the default.
* `export_json_array_gz` — reference-parity framing: rows stream through
  the driver via `toLocalIterator` (one partition in flight, bounded
  memory — NOT a collect) into a single gzip member. Use only when a
  downstream consumer requires the exact one-array file.
"""

from __future__ import annotations

import csv
import gzip
import io
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_json(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Scalable JSON-lines export: one shard per task, gzip by default.
    Column pruning/pushdown still apply to the upstream plan."""
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def export_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    files_per_partition: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Training-corpus sink [EXT]: columnar parquet, optionally
    hive-partitioned (e.g. ``partition_by=["lang"]`` so downstream
    training jobs prune by language at the SCAN). At 100 TB the failure
    mode is small-files explosion — one output file per task per
    partition value — so ``files_per_partition`` repartitions on the
    partition keys first: each partition value lands in that many files
    regardless of upstream task count."""
    if partition_by and files_per_partition:
        df = df.repartition(files_per_partition, *[F.col(c) for c in partition_by])
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def export_parquet_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet export: repartitionByRange +
    sortWithinPartitions on ``sort_col`` so every output file (and every
    row group inside it) covers a DISJOINT value range. The parquet
    footer's per-row-group min/max stats (the zone maps
    `sources/parquet.describe_indexes` surfaces) then let any reader skip
    whole row groups on ``sort_col`` predicates — the storage-layout half
    of predicate pushdown, and the single cheapest read-amplification
    win for a 100 TB corpus that is usually filtered by time or id."""
    (
        df.repartitionByRange(num_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )


def export_json_array_gz(
    df: DataFrame, path: str, batch_size: int = 1000
) -> int:
    """Reference-framed single-file export: gzip JSON array opening with
    '[\\n', rows ',\\n'-separated, closing '\\n]\\n'
    (extractor.py:307-335; framing asserted by the reference's own test
    tests/core/test_extractor.py:136-179). Returns rows written.

    Rows are serialized to JSON strings BY EXECUTORS (`to_json` runs
    JVM-side); the driver only concatenates framing bytes around an
    iterator that holds one partition at a time.
    """
    it = df.select(F.to_json(F.struct(*df.columns)).alias("j")).toLocalIterator()
    n = 0
    with gzip.open(path, "wt", encoding="utf-8") as fh:
        fh.write("[\n")
        for row in it:
            if n:
                fh.write(",\n")
            fh.write(row["j"])
            n += 1
        fh.write("\n]\n")
    return n


def export_csv(df: DataFrame, path: str, quote_all: bool = True) -> None:
    """Stats-table CSV sink with the reference's QUOTE_ALL framing
    (schema_analysis_view.py:517-546 csv.QUOTE_ALL)."""
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", str(quote_all).lower())
        .csv(path)
    )


def csv_string(rows: list[dict]) -> str:
    """Driver-side QUOTE_ALL CSV string — the reference's clipboard
    payload (schema_analysis_view.py:517-546) for small artifact tables."""
    if not rows:
        return ""
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=list(rows[0].keys()), quoting=csv.QUOTE_ALL)
    w.writeheader()
    w.writerows(rows)
    return buf.getvalue()


def write_schema_json(artifact: dict, path: str) -> None:
    """Schema/stats artifact sink: `json.dump(..., indent=2, default=str)`
    exactly as the reference persists analysis results
    (schema_analysis_view.py:448-479, data_explorer_view.py:412-443)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(artifact, fh, indent=2, default=str)
