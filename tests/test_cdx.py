"""CDX crawl index: the offset/length coordinates are NOT
SQL-expressible (zlib output bytes), so the registry entry hash-matches
only the closed-form columns — these tests carry the STRONGER checks:
every index row's (offset, length) must actually seek-fetch its own
record (digest round-trip), members must tile each archive exactly, and
the pruned fetch must never open an archive the index filter dropped
(the plan-level point of consulting an index before touching bytes).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os

import pytest
from pyspark.sql import functions as F

from ascii_hydra_spark.functions import surt_url
from ascii_hydra_spark.sources.cdx import (
    fetch_records_by_index,
    iter_gzip_members,
    iter_index_rows,
    register_cdx_source,
)
from ascii_hydra_spark.sources.warc import (
    fixture_hostfile_record,
    iter_warc_records,
    parse_http_response,
    write_warc_fixture,
)


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cdx_fixture"))
    # fixture_hostfile_record pins host = Site{i // 150}, so the
    # host-per-file property needs exactly 150 records per file
    write_warc_fixture(
        d, n_records=600, n_files=4, compress=True,
        record_fn=fixture_hostfile_record,
    )
    return d


def test_gzip_members_tile_the_archive_exactly(warc_dir):
    p = os.path.join(warc_dir, sorted(os.listdir(warc_dir))[0])
    with open(p, "rb") as f:
        members = list(iter_gzip_members(f))
    # warcinfo + (request + response) per capture
    assert len(members) == 1 + 2 * 150
    assert members[0][0] == 0
    for (o1, l1, _), (o2, _, _) in zip(members, members[1:]):
        assert o1 + l1 == o2, "gap or overlap between members"
    o, l, _ = members[-1]
    assert o + l == os.path.getsize(p)


def test_every_index_offset_seek_fetches_its_own_record(warc_dir):
    # the coordinates the oracle can't check: seek(offset), read(length),
    # gunzip, parse -> the digest column must reproduce
    for fname in sorted(os.listdir(warc_dir)):
        p = os.path.join(warc_dir, fname)
        rows = list(iter_index_rows(p))
        assert len(rows) == 150
        with open(p, "rb") as f:
            for r in rows:
                (_, _, _, offset, length, rid, _, _, status, _, digest) = r
                f.seek(offset)
                raw = gzip.decompress(f.read(length))
                recs = [
                    x
                    for x in iter_warc_records(io.BytesIO(raw))
                    if x[0].get("warc-type") == "response"
                ]
                assert len(recs) == 1
                headers, block = recs[0]
                st, _, body = parse_http_response(block)
                assert headers.get("warc-record-id") == rid
                assert st == status
                assert hashlib.md5(body).hexdigest() == digest


def test_plain_warc_offsets_also_round_trip(tmp_path):
    d = str(tmp_path / "plain")
    write_warc_fixture(d, n_records=20, n_files=1, compress=False)
    p = os.path.join(d, os.listdir(d)[0])
    raw_all = open(p, "rb").read()
    rows = list(iter_index_rows(p))
    assert len(rows) == 20
    for r in rows:
        seg = raw_all[r[3]: r[3] + r[4]]
        recs = [
            x
            for x in iter_warc_records(io.BytesIO(seg))
            if x[0].get("warc-type") == "response"
        ]
        st, _, body = parse_http_response(recs[0][1])
        assert hashlib.md5(body).hexdigest() == r[10]


def test_index_build_is_one_task_per_archive(spark, warc_dir):
    register_cdx_source(spark)
    idx = spark.read.format("cdx").option("path", warc_dir).load()
    parts = idx.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts == 4, "expected file-grain index tasks"
    assert idx.count() == 600


def test_pruned_fetch_opens_only_index_selected_archives(spark, warc_dir):
    # host-per-segment fixture: filtering one SURT host must drop 3 of 4
    # archives from the fetch entirely — asserted two ways: the fetch
    # task count, and the fact that deleting the pruned-away files does
    # not break the fetch (they are NEVER opened)
    register_cdx_source(spark)
    idx = spark.read.format("cdx").option("path", warc_dir).load().persist()
    pruned = idx.filter(
        F.substring_index(surt_url("target_uri"), ")", 1)
        == "com,example,site2"
    )
    files = [
        r["warc_path"] for r in pruned.select("warc_path").distinct().collect()
    ]
    assert len(files) == 1 and files[0].endswith("part-00002.warc.gz")
    fetched = fetch_records_by_index(pruned)
    rows = fetched.collect()
    assert len(rows) == 150
    assert all("Site2" in r["target_uri"] for r in rows)
    # byte accounting: fetched bodies hash-match the index digests
    want = {
        r["digest"] for r in pruned.select("digest").collect()
    }
    got = {
        hashlib.md5(r["body"].encode("utf-8")).hexdigest() for r in rows
    }
    assert got == want
    idx.unpersist()


def test_fetch_never_touches_pruned_files(spark, tmp_path):
    # the strongest form of "scans fewer files": physically remove the
    # archives the index filter pruned away — the fetch must still work
    d = str(tmp_path / "prune_hard")
    write_warc_fixture(
        d, n_records=600, n_files=4, compress=True,
        record_fn=fixture_hostfile_record,
    )
    register_cdx_source(spark)
    idx = spark.read.format("cdx").option("path", d).load()
    pruned = idx.filter(F.col("target_uri").contains("Site1")).persist()
    assert pruned.count() == 150  # materialize the index BEFORE deleting
    for f in os.listdir(d):
        if "part-00001" not in f:
            os.remove(os.path.join(d, f))
    assert fetch_records_by_index(pruned).count() == 150
    pruned.unpersist()
