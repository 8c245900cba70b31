"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API).

The reference reads only storage formats Spark ships readers for; a
100 TB training-data pipeline also ingests bespoke feeds (crawl frontier
APIs, proprietary record formats). The Python Data Source API is the
idiomatic Spark 4 extension point for that: the source declares its
schema and a PARTITION PLAN on the driver, and each partition is read
independently on executors — so a custom feed scales exactly like a file
scan (no driver-side collect, no single-connection bottleneck like an
unpartitioned JDBC read).

`SyntheticDocsDataSource` is the in-repo demonstration: a deterministic
document generator (id-derived text, no RNG) whose output is exactly
reproducible in SQL — which is what lets the DuckDB oracle hash-match a
*custom source* end-to-end (`pyds_docs` in the verification registry).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class _DocsPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, n_rows: int, n_partitions: int):
        self.n_rows = n_rows
        self.n_partitions = n_partitions

    def partitions(self) -> list[InputPartition]:
        """Driver-side partition plan: contiguous id ranges, one task each."""
        per = max(1, -(-self.n_rows // self.n_partitions))
        return [
            _DocsPartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _DocsPartition) -> Iterator[tuple]:
        """Executor-side: generate ONLY this partition's id range.

        Deterministic id-derived text (matches the oracle SQL in the
        verification registry exactly — any change must update both).
        """
        for i in range(partition.start, partition.end):
            yield (i, f"w{i % 5} w{i % 3} doc{i}", i % 7)


class SyntheticDocsDataSource(DataSource):
    """`spark.read.format("synthetic_docs").option("n", ...).load()`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id BIGINT, text STRING, bucket INT"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(
            n_rows=int(self.options.get("n", 1000)),
            n_partitions=int(self.options.get("partitions", 8)),
        )


class FeedStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked reader over a monotonically growing feed.

    `read(start)` returns everything available now — rows [pos, until) —
    and advances the offset to `until`; under trigger(availableNow=True)
    one run drains exactly the rows that exist at launch. A later run
    with a larger `until` and the SAME checkpoint resumes from the stored
    offset: each row is ingested exactly once across runs (asserted in
    the `pyds_stream_feed` verification query). `readBetweenOffsets` is
    the deterministic replay path Spark uses on recovery.
    """

    def __init__(self, until: int):
        self.until = until

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = start["pos"]
        hi = max(lo, self.until)
        return self._rows(lo, hi), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["pos"], end["pos"])

    @staticmethod
    def _rows(lo: int, hi: int):
        # list-backed iterator, not a generator: Spark's prefetch cache
        # copy.copy()s the iterator, and generators are not copyable
        return iter([(i, i % 5, float(i) / 2) for i in range(lo, hi)])


class FeedStreamDataSource(DataSource):
    """`spark.readStream.format("synthetic_feed").option("until", N)` —
    custom Python STREAMING source (Spark 4 API)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_feed"

    def schema(self) -> str:
        return "seq BIGINT, bucket INT, score DOUBLE"

    def simpleStreamReader(self, schema) -> FeedStreamReader:
        return FeedStreamReader(until=int(self.options.get("until", 100)))


def register_synthetic_docs(spark) -> None:
    """Idempotent registration of the custom sources on a session.

    The classes are force-pickled BY VALUE: the streaming data source's
    plan/read runners are separate Python processes that ignore
    addPyFile includes, so by-reference pickling would require
    `ascii_hydra_spark` on their import path (it isn't when the harness
    imports the repo via a sys.path insert from another cwd). This module
    is deliberately self-contained (pyspark imports only) so by-value
    serialization is closed.
    """
    # NB: must be pyspark's BUNDLED cloudpickle — that's what
    # spark.dataSource.register serializes with, not the standalone package.
    from pyspark import cloudpickle

    import ascii_hydra_spark.sources.pydatasource as _self

    cloudpickle.register_pickle_by_value(_self)
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(FeedStreamDataSource)
    spark.dataSource.register(JsonlSinkDataSource)


# ------------------------------------------------------------- write arm
# Batch DataSourceWriter: the third leg of the custom-source story
# (batch read + streaming read + now WRITE). A JSONL sink with the real
# two-phase commit shape: executors write task-private part files and
# return commit messages; the driver's commit() publishes a manifest +
# _SUCCESS marker only when every task succeeded, abort() removes the
# orphans — the same job-commit discipline a 1000-executor object-store
# sink needs (no torn output visible to readers).


class _JsonlCommit(WriterCommitMessage):
    """Picklable per-task commit message: which file, how many rows."""

    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, path: str, overwrite: bool):
        self.path = path
        self.overwrite = overwrite

    def write(self, rows):
        import json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        part = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        os.makedirs(self.path, exist_ok=True)
        # task-attempt-unique name: a retried task never clobbers another
        # attempt's file; only committed files enter the manifest
        fname = os.path.join(self.path, f"part-{part:05d}-{attempt}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in rows:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "files": sorted(os.path.basename(m.path) for m in messages if m),
            "rows": sum(m.rows for m in messages if m),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)
        open(os.path.join(self.path, "_SUCCESS"), "w").close()

    def abort(self, messages):
        import os

        for m in messages:
            if m and os.path.exists(m.path):
                os.remove(m.path)


class JsonlSinkDataSource(DataSource):
    """`df.write.format("ahs_jsonl").mode(...).save(path)`."""

    @classmethod
    def name(cls) -> str:
        return "ahs_jsonl"

    def writer(self, schema, overwrite: bool):
        import shutil

        path = self.options.get("path")
        if not path:
            raise ValueError("ahs_jsonl sink needs a path option")
        if overwrite:
            shutil.rmtree(path, ignore_errors=True)
        return JsonlSinkWriter(path, overwrite)
