"""WebDataset (tar-shard) ingestion with zero non-stdlib dependencies
[EXT — the multimodal training-data container of the pipeline tier].

Large image/audio/text training sets ship as TAR SHARDS in the
WebDataset convention (a public format: github.com/webdataset —
thousands of ~1 GiB ``.tar`` files, each member named
``<key>.<extension>``, consecutive members with the same key forming
one SAMPLE, e.g. ``img000123.jpg`` + ``img000123.cls`` +
``img000123.json``). This module gives the engine that entry point on
stdlib ``tarfile``:

* ``iter_tar_samples`` — sample walk over one shard's bytes (plain or
  gzip/bz2/xz tar via ``mode="r:*"``), grouping consecutive members by
  the WebDataset key rule: the key is the path up to the FIRST dot of
  the basename, so ``a/b.seg.png`` has key ``a/b`` and extension
  ``seg.png``;
* ``build_webdataset`` — the fixture-twin writer (pinned mtime/uid so
  shard bytes are deterministic);
* ``read_webdataset`` — the Spark source: ``binaryFile`` scan → ONE
  Arrow-batched ``mapInPandas`` stage emitting one row per member,
  keyed for a ``groupBy(key)``/pivot when a sample-per-row shape is
  wanted.

Spark shape (100-TB contract): the parallelism unit is the SHARD file
(tar has no internal sync markers; the many-~1 GiB-shards layout is the
format's own distribution story — WebDataset readers shard-shuffle the
file list, which maps exactly onto a binaryFile scan's per-file tasks).
The member walk is Python byte framing, Arrow-batched, no shuffle of
payloads. A corrupt shard quarantines as one all-NULL row (the
read_bson_dump / read_warc convention).
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

#: per-member payload cap — the shared untrusted-input bound
_MAX_MEMBER = 1 << 28


def _split_key(name: str) -> tuple[str, str]:
    """WebDataset key rule: directory + basename-up-to-FIRST-dot is the
    sample key; the remainder (may itself contain dots) is the
    extension."""
    d, _, base = name.rpartition("/")
    stem, _, ext = base.partition(".")
    return (d + "/" + stem if d else stem), ext


def iter_tar_samples(data: bytes) -> Iterator[dict]:
    """Iterate samples of one shard: ``{"__key__": str, <ext>: bytes,
    ...}`` with members grouped by the key rule above. Only regular
    file members carry payloads; directories/links are skipped.
    Malformed archives raise ValueError (the untrusted-input
    contract)."""
    try:
        tf = tarfile.open(fileobj=io.BytesIO(data), mode="r:*")
    except (tarfile.TarError, EOFError, OSError) as exc:
        raise ValueError(f"not a tar shard: {exc}") from None
    cur: dict | None = None
    try:
        for member in tf:
            if not member.isfile():
                continue
            if member.size > _MAX_MEMBER:
                raise ValueError("tar member exceeds the size bound")
            key, ext = _split_key(member.name)
            if not ext:
                raise ValueError(
                    f"tar member {member.name!r} has no extension"
                )
            payload = tf.extractfile(member).read()
            if cur is None or cur["__key__"] != key:
                if cur is not None:
                    yield cur
                cur = {"__key__": key}
            cur[ext] = payload
    except (tarfile.TarError, EOFError) as exc:
        raise ValueError(f"corrupt tar shard: {exc}") from None
    if cur is not None:
        yield cur


def build_webdataset(
    samples: list[dict], gzip_shard: bool = False
) -> bytes:
    """Write samples (``{"__key__": ..., <ext>: bytes}``) into a
    deterministic tar shard — mtime/uid/gid pinned to zero, members
    emitted in dict order per sample."""
    buf = io.BytesIO()
    mode = "w:gz" if gzip_shard else "w"
    kwargs = {"compresslevel": 6} if gzip_shard else {}
    with tarfile.open(fileobj=buf, mode=mode, **kwargs) as tf:
        for sample in samples:
            key = sample["__key__"]
            for ext, payload in sample.items():
                if ext == "__key__":
                    continue
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


_SCHEMA = (
    "path string, key string, ext string, content_length long, "
    "content binary"
)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame of shard members under ``path`` — one row per member
    (``groupBy(key)`` reassembles samples). A corrupt shard yields ONE
    all-NULL quarantine row with its path."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                try:
                    for sample in iter_tar_samples(bytes(blob)):
                        key = sample["__key__"]
                        for ext, payload in sample.items():
                            if ext == "__key__":
                                continue
                            rows.append(
                                (fpath, key, ext, len(payload), payload)
                            )
                except ValueError:
                    rows.append((fpath, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "key", "ext", "content_length", "content",
                ],
            )

    return files.mapInPandas(gen, _SCHEMA)
