"""WARC (Web ARChive) ingestion as a Spark 4 custom Python Data Source.

The reference's production workload starts from Common Crawl WARC dumps
(reference paper.md:139-155 describes the crawl pipeline; its Databricks
provisioning ships ``fastwarc``/``warcio``/``surt`` —
resources/databricks.py:76-78). This module re-expresses that ingestion
Spark-first with ZERO third-party dependencies: a pure-stdlib ISO
28500 (WARC/1.0) record parser mounted on the ``pyspark.sql.datasource``
API, so a crawl dump scans like any other table — schema declared on the
driver, one task per archive file on executors.

Scale shape: Common Crawl ships ~1 GB ``.warc.gz`` segments in the
hundred-thousands per crawl. Gzip members are not splittable mid-stream,
so FILE-grain parallelism is the right (and the reference-toolchain's
own) partitioning: each executor task streams exactly one archive,
decompresses member-by-member, and never materializes more than one
record block — constant memory per task, and a 1000-executor cluster
schedules 1000 archives at a time. Records parse into flat scalar
columns (status, content-type, body text) so every downstream filter
(status == 200, content_type == 'text/html') prunes before any text
operator runs.

The module is deliberately self-contained (stdlib + pyspark imports
only): ``register_warc_source`` force-pickles it BY VALUE so executor
processes never need the repo on their import path — the same discipline
as ``pydatasource.py``.

A deterministic fixture writer (``write_warc_fixture``) produces real
multi-record, multi-file, per-record-gzip-member archives with warcinfo
+ request + response records, so the parser is exercised against
genuine WARC bytes and the DuckDB oracle can reconstruct the expected
rows in closed form (``warc_records_scan`` in the verification
registry).
"""

from __future__ import annotations

import gzip
import io
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_CRLF = b"\r\n"


# --------------------------------------------------------------- parsing


def iter_warc_records(stream) -> "Iterator[tuple[dict, bytes]]":
    """Yield (warc_headers_lowercased, content_block_bytes) per record.

    Streaming single-pass parse of a WARC/1.0-1.1 byte stream: version
    line, header lines to the first blank, then exactly Content-Length
    block bytes. Only one record block is in memory at a time. Works on
    any binary file-like with readline/read — plain files and
    gzip.GzipFile over concatenated per-record members alike.
    """
    while True:
        line = stream.readline()
        if not line:
            return
        if line in (_CRLF, b"\n"):  # inter-record blank lines
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line!r}")
        headers: dict[str, str] = {}
        last_key: "str | None" = None
        while True:
            h = stream.readline()
            if h in (_CRLF, b"\n", b""):
                break
            # ISO 28500 allows folded header values: a line starting
            # with SP/TAB continues the PREVIOUS header's value.
            # Misreading one as a fresh header would at best invent a
            # garbage key and at worst desynchronize the stream (a
            # folded Content-Length-bearing value).
            if h[:1] in (b" ", b"\t") and last_key is not None:
                cont = h.decode("utf-8", "replace").strip()
                headers[last_key] = (headers[last_key] + " " + cont).strip()
                continue
            k, _, v = h.decode("utf-8", "replace").partition(":")
            last_key = k.strip().lower()
            headers[last_key] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError as e:
            # a garbage Content-Length desynchronizes the record stream:
            # there is no way to find the next boundary, so abort loudly
            # rather than silently misparse everything after it
            raise ValueError(
                f"unparsable Content-Length "
                f"{headers.get('content-length')!r}"
            ) from e
        block = stream.read(clen)
        if len(block) != clen:
            raise ValueError(
                f"truncated WARC record: wanted {clen} block bytes, "
                f"got {len(block)}"
            )
        yield headers, block


def parse_http_response(block: bytes) -> "tuple[int, dict, bytes]":
    """(status_code, http_headers_lowercased, body_bytes) from the HTTP
    response block of a WARC response record.

    NEVER raises: real crawl dumps contain non-HTTP response records
    (dns), LF-only header framing, and corrupt status lines, and one bad
    record must not kill a multi-thousand-archive scan (a task fails 4x
    and the job dies). A block that does not start with an HTTP status
    line is returned WHOLE as the body with status 0 (header splitting
    a non-HTTP block would silently eat its leading bytes); an HTTP
    block with a corrupt status code degrades to status 0 with its
    body intact. A `http_status = 0` filter surfaces the junk
    downstream.
    """
    if not block.startswith(b"HTTP/"):
        return 0, {}, block
    head, sep, body = block.partition(b"\r\n\r\n")
    if not sep:  # LF-only framing fallback
        head, sep, body = block.partition(b"\n\n")
        if not sep:
            head, body = b"", block
    lines = head.replace(b"\r\n", b"\n").split(b"\n")
    status = 0
    first = lines[0].decode("latin-1", "replace") if lines and lines[0] else ""
    parts = first.split(None, 2)
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.decode("latin-1", "replace").partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, body


def _open_warc(path: str):
    """Binary record stream for a plain or gzip (multi-member) archive."""
    if path.endswith(".gz"):
        # GzipFile reads concatenated members transparently; the
        # BufferedReader gives readline() a real buffer
        return io.BufferedReader(gzip.open(path, "rb"))
    return open(path, "rb")


# ------------------------------------------------------------ datasource


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    """One input partition per archive file (gzip members are not
    splittable mid-stream — file grain is the Common Crawl contract;
    segment files are sized ~1 GB for exactly this reason)."""

    def __init__(self, paths: "list[str]"):
        self.paths = paths

    def partitions(self) -> "list[InputPartition]":
        return [_WarcFilePartition(p) for p in self.paths]

    def read(self, partition: _WarcFilePartition) -> Iterator[tuple]:
        fname = os.path.basename(partition.path)
        with _open_warc(partition.path) as stream:
            for headers, block in iter_warc_records(stream):
                if headers.get("warc-type") != "response":
                    continue  # warcinfo / request / metadata records
                status, http, body = parse_http_response(block)
                ctype = http.get("content-type", "")
                yield (
                    fname,
                    headers.get("warc-record-id", ""),
                    headers.get("warc-date", ""),
                    headers.get("warc-target-uri", ""),
                    status,
                    ctype.partition(";")[0].strip(),
                    len(body),
                    body.decode("utf-8", "replace"),
                )


class WarcDataSource(DataSource):
    """``spark.read.format("warc").option("path", dir_or_file).load()``.

    The driver expands the path (file, or directory of ``*.warc`` /
    ``*.warc.gz``) into the partition plan; executors stream one archive
    each. ``content_length`` is the BYTE length of the HTTP body;
    ``body`` is its UTF-8 decode (invalid sequences replaced — crawl
    data lies about encodings).
    """

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return (
            "warc_file STRING, record_id STRING, warc_date STRING, "
            "target_uri STRING, http_status INT, content_type STRING, "
            "content_length BIGINT, body STRING"
        )

    def reader(self, schema) -> WarcReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("warc source needs a path option")
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
        return WarcReader(paths)


def register_warc_source(spark) -> None:
    """Idempotent registration; BY-VALUE pickling for executor closure
    (same rationale as pydatasource.register_synthetic_docs)."""
    from pyspark import cloudpickle

    import ascii_hydra_spark.sources.warc as _self

    cloudpickle.register_pickle_by_value(_self)
    spark.dataSource.register(WarcDataSource)


# --------------------------------------------------------------- fixture


def fixture_record(i: int) -> "tuple[str, str, str, int, str, str]":
    """Deterministic spec of fixture response record ``i`` —
    (record_id, warc_date, target_uri, http_status, content_type, body).
    Closed-form in ``i`` so the DuckDB oracle reconstructs it in SQL
    (the warc_records_scan entry); any change here must update that
    oracle. Mixed-case hosts and out-of-order query params exist to
    exercise surt_url; every 10th body carries multibyte UTF-8.
    """
    record_id = f"urn:uuid:00000000-0000-0000-0000-{i:012d}"
    warc_date = f"2024-01-{1 + i % 28:02d}T00:00:00Z"
    uri = (
        f"http://www.Site{i % 7}.Example.COM/path/{i}/page"
        f"?b={i % 3}&a={i % 5}"
    )
    status = {2: 301, 3: 404}.get(i % 5, 200)
    ctype = ["text/html", "text/plain", "application/json"][i % 3]
    body = f"Record {i} crawl body " + f"w{i % 11} " * (i % 13)
    if i % 10 == 0:
        body += "café"
    return record_id, warc_date, uri, status, ctype, body


def fixture_html_record(i: int) -> "tuple[str, str, str, int, str, str]":
    """Deterministic HTML fixture capture ``i`` — the content-dedup
    sibling of :func:`fixture_record`: bodies are full HTML pages with
    script/style/head/comment traps around a closed-form text payload,
    and payloads come in NEAR-DUPLICATE groups of 3 (group = i//3;
    variants differ in ONE trailing token out of 17, word-bigram
    Jaccard 15/17 ~ 0.882 — above the 0.8 MinHash threshold). Every
    5th group is a too-short "tiny" page that must FAIL the Gopher
    word-count gate. Closed-form in ``i`` so the DuckDB oracle
    reconstructs payloads, gate outcomes, and the duplicate structure
    in SQL (the warc_content_dedup_pipeline entry); any change here
    must update that oracle.
    """
    record_id = f"urn:uuid:00000000-0000-0000-0000-{i:012d}"
    warc_date = f"2024-02-{1 + i % 28:02d}T00:00:00Z"
    g, v = i // 3, i % 3
    uri = f"http://www.Site{g % 7}.Example.COM/doc/{g}/v{v}"
    status = {2: 301, 3: 404}.get(i % 5, 200)
    if g % 5 == 4:
        content = f"tiny doc {g}"
    else:
        content = (
            f"group {g} shared crawl content block "
            + " ".join(f"w{g}x{j}" for j in range(10))
            + f" tail{v}"
        )
    body = (
        f"<html><head><title>Doc {i}</title><style>p{{color:red}}</style>"
        f"</head><body><p>{content}</p><script>var v={v};</script>"
        f"<!-- capture {i} --></body></html>"
    )
    return record_id, warc_date, uri, status, "text/html", body


def fixture_linked_record(i: int) -> "tuple[str, str, str, int, str, str]":
    """Deterministic HTML capture ``i`` with ANCHOR OUTLINKS — the WAT
    fixture: each 200-status page carries four ``<a href>`` anchors, of
    which exactly two survive WAT extraction (an absolute cross-host
    link to host ``i % 3`` with out-of-order query params to exercise
    SURT param sorting, and a root-relative same-host link that must
    resolve against the page origin) and two are traps (a fragment-only
    href and a mailto:). Source host = ``i % 7`` and link-target host =
    ``i % 3``, so the domain graph is asymmetric: hosts 0-2 receive
    cross-host links from all seven hosts, hosts 3-6 only self-links —
    PageRank over the aggregated domain graph has two distinct tiers.
    Closed-form in ``i`` so the DuckDB oracle reconstructs the edge set
    in SQL (the wat_outlink_edges / domain_graph_aggr /
    wat_domain_pagerank entries); any change here must update those
    oracles.
    """
    record_id = f"urn:uuid:00000000-0000-0000-0000-{i:012d}"
    warc_date = f"2024-04-{1 + i % 28:02d}T00:00:00Z"
    uri = f"http://www.Site{i % 7}.Example.COM/page/{i}"
    status = {2: 301, 3: 404}.get(i % 5, 200)
    abs_href = (
        f"http://www.Site{i % 3}.Example.COM/deep/{i % 13}/page"
        f"?b={i % 3}&a={i % 5}"
    )
    rel_href = f"/local/{i % 11}"
    body = (
        f"<html><head><title>Page {i}</title></head><body>"
        f"<p>outlinks {i}</p>"
        f'<a href="{abs_href}">next</a> '
        f"<a href='{rel_href}'>local</a> "
        f'<a href="#frag">top</a> '
        f'<a href="mailto:team@example.com">mail</a>'
        f"</body></html>"
    )
    return record_id, warc_date, uri, status, "text/html", body


def fixture_multisuffix_record(i: int) -> "tuple[str, str, str, int, str, str]":
    """Deterministic HTML capture ``i`` with MULTI-SUFFIX hosts — the
    eTLD+1 fixture: source host cycles over 8 templates (j = i % 8,
    g = i % 3) chosen so every public-suffix-list case in
    ``functions/psl.py`` has graph consequences at the registered-domain
    grain:

    - j=0 ``cdn.shop{g}.co.uk`` and j=1 ``shop{g}.co.uk`` COLLAPSE into
      one eTLD+1 node (depth-2 ccTLD rule) while staying two host-grain
      nodes;
    - j=2 ``app.acme{g}.com`` exercises the default single-label rule;
    - j=3 ``blog{g}.github.io`` stays its OWN node (private suffix);
    - j=4 ``m.news{g}.com.au`` a second depth-2 registry;
    - j=5 ``files.bucket{g}.s3.amazonaws.com`` the depth-3 rule;
    - j=6 ``pad{g}.baz.mm`` the wildcard-TLD rule;
    - j=7 ``github.io`` IS a public suffix — its pages must DROP from
      the eTLD+1 rollup entirely (no registered domain).

    Each 200-status page carries one absolute cross-host anchor (target
    = template (i+1) % 8 with g = (i+1) % 3, out-of-order query params
    to exercise SURT sorting), one root-relative self link, and two
    traps (fragment-only, mailto:). Closed-form in ``i`` so the DuckDB
    oracle reconstructs the edge set AND replays the suffix match in
    SQL (the registered_domain_map / domain_graph_aggr_etld1 /
    wat_pagerank_etld1 entries); any change here must update those
    oracles.
    """
    record_id = f"urn:uuid:00000000-0000-0000-0000-{i:012d}"
    warc_date = f"2024-05-{1 + i % 28:02d}T00:00:00Z"

    def host(j: int, g: int) -> str:
        return (
            f"cdn.shop{g}.co.uk", f"shop{g}.co.uk", f"app.acme{g}.com",
            f"blog{g}.github.io", f"m.news{g}.com.au",
            f"files.bucket{g}.s3.amazonaws.com", f"pad{g}.baz.mm",
            "github.io",
        )[j]

    src = host(i % 8, i % 3)
    dst = host((i + 1) % 8, (i + 1) % 3)
    uri = f"http://{src}/page/{i}"
    status = {2: 301, 3: 404}.get(i % 5, 200)
    abs_href = f"http://{dst}/deep/{i % 13}/page?b={i % 3}&a={i % 5}"
    rel_href = f"/local/{i % 11}"
    body = (
        f"<html><head><title>Page {i}</title></head><body>"
        f"<p>domains {i}</p>"
        f'<a href="{abs_href}">next</a> '
        f"<a href='{rel_href}'>local</a> "
        f'<a href="#frag">top</a> '
        f'<a href="mailto:team@example.com">mail</a>'
        f"</body></html>"
    )
    return record_id, warc_date, uri, status, "text/html", body


def fixture_hostfile_record(i: int) -> "tuple[str, str, str, int, str, str]":
    """Deterministic fixture capture ``i`` with HOST-PER-SEGMENT
    locality: host = Site{i // 150}, so each 150-record archive file
    holds exactly one host — the locality real crawls have (Common
    Crawl segments shard by crawl partition), and what makes a CDX
    surt-prefix filter prune whole FILES rather than just records.
    Same body/status/date closed forms as :func:`fixture_record`
    (shared oracle reconstruction); used by the cdx_* entries with
    n_records=600, n_files=4 so file f <=> host Site{f}.
    """
    record_id, warc_date, _, status, ctype, body = fixture_record(i)
    uri = (
        f"http://www.Site{i // 150}.Example.COM/path/{i}/page"
        f"?b={i % 3}&a={i % 5}"
    )
    return record_id, warc_date, uri, status, ctype, body


def fixture_revisit_record(i: int) -> "tuple[str, str, str, int, str, str]":
    """Deterministic fixture capture ``i`` with REVISITS: the body is a
    closed form of ``g = i % 250``, so groups 0-99 are captured three
    times (i, i+250, i+500) and groups 100-249 twice — the duplicate
    structure a CDX digest-revisit pass must recover (Common Crawl's
    `revisit` record type records exactly this). Captures of one group
    share URL/status/body but differ in warc_date (crawl day = 1+i//250)
    and record_id. Closed-form in ``i`` so the DuckDB oracle
    reconstructs group sizes and digests in SQL (cdx_revisit_detection);
    any change here must update that oracle.
    """
    g = i % 250
    record_id = f"urn:uuid:00000000-0000-0000-0000-{i:012d}"
    warc_date = f"2024-03-{1 + i // 250:02d}T00:00:00Z"
    uri = f"http://www.Site{g % 7}.Example.COM/item/{g}/page?b={g % 3}&a={g % 5}"
    status = {2: 301, 3: 404}.get(g % 5, 200)
    ctype = ["text/html", "text/plain", "application/json"][g % 3]
    body = f"Revisit {g} body " + f"w{g % 11} " * (g % 13)
    return record_id, warc_date, uri, status, ctype, body


def _warc_record(headers: "list[tuple[str, str]]", block: bytes) -> bytes:
    head = b"WARC/1.0\r\n"
    head += b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers
    )
    head += f"Content-Length: {len(block)}\r\n\r\n".encode()
    return head + block + b"\r\n\r\n"


def write_warc_fixture(
    out_dir: str,
    n_records: int = 600,
    n_files: int = 4,
    compress: bool = True,
    record_fn=fixture_record,
) -> "list[str]":
    """Write ``n_records`` fixture crawl captures as real WARC archives.

    Each file carries a warcinfo record, then a request + response pair
    per capture (the parser must skip the non-response records); with
    ``compress`` each record is its own gzip member, concatenated — the
    Common Crawl layout that lets a streaming reader resynchronize at
    member boundaries. Records are split into ``n_files`` contiguous
    ranges, mirroring crawl segmentation. ``record_fn`` picks the
    capture spec (:func:`fixture_record` default;
    :func:`fixture_html_record` for the content-dedup pipeline,
    :func:`fixture_hostfile_record` for host-per-file CDX pruning).
    """
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"
    per = -(-n_records // n_files)
    paths = []
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n_records)
        path = os.path.join(out_dir, f"part-{f:05d}{ext}")
        paths.append(path)
        chunks = [
            _warc_record(
                [
                    ("WARC-Type", "warcinfo"),
                    ("WARC-Date", "2024-01-01T00:00:00Z"),
                    ("WARC-Record-ID", f"urn:uuid:ffffffff-0000-0000-0000-{f:012d}"),
                    ("Content-Type", "application/warc-fields"),
                ],
                b"software: ascii-hydra-spark warc fixture\r\n",
            )
        ]
        for i in range(lo, hi):
            rid, date, uri, status, ctype, body = record_fn(i)
            body_b = body.encode("utf-8")
            chunks.append(
                _warc_record(
                    [
                        ("WARC-Type", "request"),
                        ("WARC-Date", date),
                        ("WARC-Record-ID", rid + "-req"),
                        ("WARC-Target-URI", uri),
                        ("Content-Type", "application/http; msgtype=request"),
                    ],
                    f"GET /path/{i}/page HTTP/1.1\r\nHost: site\r\n\r\n".encode(),
                )
            )
            http = (
                f"HTTP/1.1 {status} "
                f"{'OK' if status == 200 else 'X'}\r\n"
                f"Content-Type: {ctype}; charset=utf-8\r\n"
                f"Content-Length: {len(body_b)}\r\n\r\n"
            ).encode() + body_b
            chunks.append(
                _warc_record(
                    [
                        ("WARC-Type", "response"),
                        ("WARC-Date", date),
                        ("WARC-Record-ID", rid),
                        ("WARC-Target-URI", uri),
                        ("Content-Type", "application/http; msgtype=response"),
                    ],
                    http,
                )
            )
        with open(path, "wb") as out:
            if compress:
                for c in chunks:  # one gzip member per record
                    out.write(gzip.compress(c, mtime=0))
            else:
                for c in chunks:
                    out.write(c)
    return paths
