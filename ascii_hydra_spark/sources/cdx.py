"""CDX-style crawl index over WARC archives: build the index, then
fetch ONLY the records the index selects — the Common Crawl access
pattern (nobody scans 100k archives; you query the CDX index for the
(file, offset, length) triples you want, then range-request exactly
those gzip members).

The reference's crawl toolchain provisions fastwarc/warcio/surt for
exactly this workflow (reference resources/databricks.py:76-78 and the
paper.md crawl pipeline); this module re-expresses it Spark-first and
pure-stdlib:

- ``CdxDataSource`` (format ``"cdx"``): one task per archive (same
  file-grain contract as the WARC scan), emitting one index row per
  RESPONSE record with its byte ``offset``/``length`` inside the
  archive. For ``.warc.gz`` these are the COMPRESSED gzip-member
  coordinates (each record is its own member — the Common Crawl
  layout), found by walking members with ``zlib.decompressobj`` and
  its ``unused_data`` tail, so the index enables true random access:
  seek(offset), read(length), gunzip, parse — no scan.
- ``fetch_records_by_index``: the selective-fetch side. A
  ``mapInPandas`` over index rows repartitioned BY ARCHIVE (so each
  file opens once per task, offsets fetched in ascending order =
  forward-only seeks); only files that survive the index filter are
  ever opened — filter the index, and whole archives drop out of the
  fetch (the plan-level point of a CDX index).

Column discipline: the index carries flat scalars only (surt/status/
digest/offset/length), so index-side filters are codegen + pushdown
territory and never touch record payloads; payload bytes move ONLY for
fetched records.
"""

from __future__ import annotations

import gzip
import io
import os
import zlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ascii_hydra_spark.sources.warc import (
    iter_warc_records,
    parse_http_response,
)

_INDEX_SCHEMA = (
    "warc_file STRING, warc_path STRING, seq INT, offset BIGINT, "
    "length BIGINT, record_id STRING, warc_date STRING, "
    "target_uri STRING, http_status INT, content_length BIGINT, "
    "digest STRING"
)

_FETCH_SCHEMA = (
    "warc_file STRING, record_id STRING, warc_date STRING, "
    "target_uri STRING, http_status INT, content_type STRING, "
    "content_length BIGINT, body STRING"
)


def iter_gzip_members(stream) -> "Iterator[tuple[int, int, bytes]]":
    """Yield (offset, compressed_length, decompressed_bytes) per gzip
    member of a concatenated-member archive — the member walk that
    gives a CDX index its random-access coordinates. Tracks consumed
    COMPRESSED bytes via ``decompressobj.unused_data``; constant
    memory per member (one member's payload at a time, like the
    streaming parser)."""
    offset = 0
    tail = b""  # compressed bytes read past the previous member's end
    while True:
        if not tail:
            tail = stream.read(1 << 20)
            if not tail:
                return
        d = zlib.decompressobj(wbits=31)
        payload = bytearray(d.decompress(tail))
        fed = len(tail)
        while not d.eof:
            chunk = stream.read(1 << 20)
            if not chunk:
                raise ValueError("truncated gzip member")
            payload += d.decompress(chunk)
            fed += len(chunk)
        consumed = fed - len(d.unused_data)
        yield offset, consumed, bytes(payload)
        offset += consumed
        tail = d.unused_data


class _CountingReader:
    """readline/read wrapper that tracks the byte position — gives the
    plain-``.warc`` arm its record offsets without re-reading."""

    def __init__(self, raw):
        self._raw = raw
        self.pos = 0

    def readline(self) -> bytes:
        b = self._raw.readline()
        self.pos += len(b)
        return b

    def read(self, n: int) -> bytes:
        b = self._raw.read(n)
        self.pos += len(b)
        return b


def iter_index_rows(path: str) -> "Iterator[tuple]":
    """One CDX row per response record of one archive, offsets in the
    archive's own byte space (compressed member coordinates for .gz,
    raw record coordinates for plain .warc)."""
    import hashlib

    fname = os.path.basename(path)
    seq = 0

    def row(offset: int, length: int, headers: dict, block: bytes):
        nonlocal seq
        status, _http, body = parse_http_response(block)
        r = (
            fname,
            path,
            seq,
            offset,
            length,
            headers.get("warc-record-id", ""),
            headers.get("warc-date", ""),
            headers.get("warc-target-uri", ""),
            status,
            len(body),
            hashlib.md5(body).hexdigest(),
        )
        seq += 1
        return r

    if path.endswith(".gz"):
        with open(path, "rb") as f:
            for offset, length, payload in iter_gzip_members(f):
                for headers, block in iter_warc_records(io.BytesIO(payload)):
                    if headers.get("warc-type") != "response":
                        continue
                    yield row(offset, length, headers, block)
    else:
        with open(path, "rb") as f:
            c = _CountingReader(f)
            # consume leading blanks the same way the parser does, so
            # `start` lands exactly on each record's version line
            start = c.pos
            for headers, block in iter_warc_records(c):
                if headers.get("warc-type") == "response":
                    yield row(start, c.pos - start, headers, block)
                start = c.pos


class _CdxFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CdxReader(DataSourceReader):
    def __init__(self, paths: "list[str]"):
        self.paths = paths

    def partitions(self) -> "list[InputPartition]":
        return [_CdxFilePartition(p) for p in self.paths]

    def read(self, partition: _CdxFilePartition) -> Iterator[tuple]:
        return iter(list(iter_index_rows(partition.path)))


class CdxDataSource(DataSource):
    """``spark.read.format("cdx").option("path", dir_or_file).load()``
    — the index-build scan. Same path expansion as the warc source."""

    @classmethod
    def name(cls) -> str:
        return "cdx"

    def schema(self) -> str:
        return _INDEX_SCHEMA

    def reader(self, schema) -> CdxReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("cdx source needs a path option")
        if os.path.isdir(path):
            paths = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith((".warc", ".warc.gz"))
            )
        else:
            paths = [path]
        if not paths:
            raise ValueError(f"no .warc/.warc.gz files under {path}")
        return CdxReader(paths)


def register_cdx_source(spark) -> None:
    """Idempotent registration; BY-VALUE pickling for executor closure
    (same rationale as register_warc_source)."""
    from pyspark import cloudpickle

    import ascii_hydra_spark.sources.cdx as _self

    cloudpickle.register_pickle_by_value(_self)
    spark.dataSource.register(CdxDataSource)


def fetch_records_by_index(index_df):
    """Selective record fetch from CDX index rows: seek(offset),
    read(length), decode the one member, parse the one record. Input
    needs (warc_path, offset, length); returns the warc-scan record
    schema. Repartitioned by archive so each task opens its file once
    and walks offsets ascending (forward-only seeks); archives absent
    from the (filtered) index are NEVER opened — the whole point of
    consulting the index first."""
    from pyspark.sql import functions as F

    def fetch(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for path, grp in pdf.groupby("warc_path", sort=True):
                with open(path, "rb") as f:
                    fname = os.path.basename(path)
                    for _, r in grp.sort_values("offset").iterrows():
                        f.seek(int(r["offset"]))
                        raw = f.read(int(r["length"]))
                        if path.endswith(".gz"):
                            raw = gzip.decompress(raw)
                        recs = list(iter_warc_records(io.BytesIO(raw)))
                        for headers, block in recs:
                            if headers.get("warc-type") != "response":
                                continue
                            status, http, body = parse_http_response(block)
                            ctype = http.get("content-type", "")
                            out.append(
                                (
                                    fname,
                                    headers.get("warc-record-id", ""),
                                    headers.get("warc-date", ""),
                                    headers.get("warc-target-uri", ""),
                                    status,
                                    ctype.partition(";")[0].strip(),
                                    len(body),
                                    body.decode("utf-8", "replace"),
                                )
                            )
            cols = [
                "warc_file", "record_id", "warc_date", "target_uri",
                "http_status", "content_type", "content_length", "body",
            ]
            yield pd.DataFrame(out, columns=cols)

    return index_df.select("warc_path", "offset", "length").repartition(
        F.col("warc_path")
    ).mapInPandas(fetch, schema=_FETCH_SCHEMA)
