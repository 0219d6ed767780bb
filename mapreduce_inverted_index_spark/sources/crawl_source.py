"""Custom Python DataSource: the reference's paginated category crawl
(S1, ``master/src/coordinator.py``'s page walker) re-expressed as a
first-class Spark connector via the Python DataSource API (Spark 4.x)
— the Spark-native answer to "my source isn't a file format".

The reference hand-rolled pagination: the master walked category
pages, handed page URLs to mappers over HTTP, and tracked a cursor of
seen pages. Here the SAME shape is a ``DataSource``:

  * **Batch**: ``partitions()`` plans one ``InputPartition`` per page
    (page = a row range of the snapshot), so Spark schedules pages
    exactly like the master scheduled page fetches — but with retry,
    locality, and speculation for free. ``read(partition)`` pulls
    only that page, and only the projected columns, through pyarrow
    (column pruning reaches the connector: Spark hands the pruned
    schema to ``reader()``).
  * **Streaming**: ``SimpleDataSourceStreamReader`` keeps the page
    CURSOR as the stream offset ({"page": n} — literally the
    reference's seen-page cursor, now checkpointed by Spark).
    Each micro-batch serves the pages that appeared since the last
    offset; replay between committed offsets is deterministic
    (``readBetweenOffsets``), which is what makes the source
    exactly-once under checkpoint recovery.

The "site" being crawled is the ``documents`` snapshot (fixtures are
static by design — TESTDATA.md S3); a production deployment points
the same class at a paginated HTTP API by swapping the pyarrow reads
for requests, with the partition/offset planning unchanged.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

__all__ = ["CrawlSource", "register_crawl_source", "read_crawl_site"]

_FULL_SCHEMA = "doc_id long, source string, n_chars long"


class _PagePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _num_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _read_page(path: str, start: int, end: int, columns: list[str]):
    """Stream only the [start, end) rows: row groups wholly before the
    page are SKIPPED via footer metadata (never decoded), decoding
    stops at the first batch past the page end. Within the overlapping
    row groups the decode is batch-granular — exact page-restricted
    I/O needs page-aligned row groups, which is how a production
    snapshot would be written (row_group_size = page_size)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    pos = 0
    first_rg = 0
    # skip row groups entirely before the page (metadata only)
    while first_rg < pf.metadata.num_row_groups:
        n = pf.metadata.row_group(first_rg).num_rows
        if pos + n > start:
            break
        pos += n
        first_rg += 1
    for batch in pf.iter_batches(
        columns=columns, row_groups=range(first_rg, pf.metadata.num_row_groups)
    ):
        if pos >= end:
            break
        lo, hi = max(start - pos, 0), min(end - pos, len(batch))
        if lo < hi:
            sl = batch.slice(lo, hi - lo)
            yield from zip(*[c.to_pylist() for c in sl.columns])
        pos += len(batch)


class _CrawlBatchReader(DataSourceReader):
    def __init__(self, options: dict, schema_cols: list[str]):
        self.path = options["path"]
        self.page_size = int(options.get("page_size", "500"))
        self.cols = schema_cols

    def partitions(self):
        n = _num_rows(self.path)
        return [
            _PagePartition(self.path, s, min(s + self.page_size, n))
            for s in range(0, n, self.page_size)
        ]

    def read(self, part: _PagePartition):
        yield from _read_page(part.path, part.start, part.end, self.cols)


class _CrawlStreamReader(SimpleDataSourceStreamReader):
    """Page-cursor stream: offset = {"page": next unserved page}."""

    def __init__(self, options: dict, schema_cols: list[str]):
        self.path = options["path"]
        self.page_size = int(options.get("page_size", "500"))
        self.pages_per_batch = int(options.get("pages_per_batch", "1"))
        self.cols = schema_cols

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _n_pages(self) -> int:
        n = _num_rows(self.path)
        return (n + self.page_size - 1) // self.page_size

    def read(self, start: dict):
        # The prefetch protocol needs the batch BOTH picklable (it is
        # cached and shipped) and an iterator (the no-progress path
        # probes it with next()): a materialized list_iterator is the
        # one shape satisfying both — a raw generator fails pickling,
        # a raw list fails the next() probe. Batches are at most
        # pages_per_batch pages, so materializing is bounded.
        n_rows = _num_rows(self.path)  # one footer read per trigger
        n_pages = (n_rows + self.page_size - 1) // self.page_size
        first = start["page"]
        last = min(first + self.pages_per_batch, n_pages)
        end_off = {"page": last}
        if last == first:
            return iter(()), end_off
        rows = list(
            _read_page(
                self.path,
                first * self.page_size,
                min(last * self.page_size, n_rows),
                self.cols,
            )
        )
        return iter(rows), end_off

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of a committed page range (recovery)
        return list(
            _read_page(
                self.path,
                start["page"] * self.page_size,
                min(end["page"] * self.page_size, _num_rows(self.path)),
                self.cols,
            )
        )

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up; the snapshot is immutable


class CrawlSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_crawl"

    def schema(self) -> str:
        return _FULL_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _CrawlBatchReader(self.options, schema.fieldNames())

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _CrawlStreamReader(self.options, schema.fieldNames())

    def writer(self, schema, overwrite: bool):
        return _CrawlPageWriter(self.options, overwrite)


def register_crawl_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(CrawlSource)


# ------------------------------------------------------- writer face
# The reference's K2 sink (final JSON index, reducer/src/processor.py)
# as the connector's write path — with the transactional two-phase
# protocol the reference's bare file write lacked: executors stage
# task-unique JSONL page files and return commit messages; the driver
# publishes an atomic MANIFEST naming exactly the committed pages
# (os.replace — readers never observe a partial site); abort removes
# staged files. A retried/speculated task stages a second file but
# only the winning attempt's message reaches commit(), so the
# manifest stays exactly-once — rename-based Hadoop committers pay a
# listing+rename per file for the same guarantee.

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _PageCommit(WriterCommitMessage):
    def __init__(self, file: str, n_rows: int):
        self.file = file
        self.n_rows = n_rows


class _CrawlPageWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, rows) -> _PageCommit:
        import json
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(f"{self.path}/_staging", exist_ok=True)
        tc = TaskContext.get()
        # attempt-unique name: a speculated/retried attempt writes its
        # own file; only the committed attempt's message is published
        fname = (
            f"_staging/page-{tc.partitionId() if tc else 0}"
            f"-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(f"{self.path}/{fname}", "w") as f:
            for row in rows:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _PageCommit(fname, n)

    def commit(self, messages) -> None:
        import json
        import os

        manifest_path = f"{self.path}/_MANIFEST.json"
        # honor the save mode: append MERGES the previously published
        # manifest (a second job must not unpublish earlier pages);
        # overwrite retires the old pages before publishing
        pages = []
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                old_pages = json.load(f)["pages"]
            if self.overwrite:
                for p in old_pages:
                    try:
                        os.remove(f"{self.path}/{p['file']}")
                    except FileNotFoundError:
                        pass
            else:
                pages.extend(old_pages)
        for m in messages:
            if m is None or m.n_rows == 0:
                continue
            final = m.file.replace("_staging/", "")
            os.replace(f"{self.path}/{m.file}", f"{self.path}/{final}")
            pages.append({"file": final, "n_rows": m.n_rows})
        tmp = f"{self.path}/_MANIFEST.tmp"
        with open(tmp, "w") as f:
            json.dump({"pages": pages}, f)
        os.replace(tmp, manifest_path)  # atomic publish

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(f"{self.path}/{m.file}")
                except FileNotFoundError:
                    pass


def read_crawl_site(spark, path: str):
    """Read back a published site: ONLY pages named by the manifest
    (staged/aborted leftovers are invisible — the reader-side half of
    the transactional contract)."""
    import json

    with open(f"{path}/_MANIFEST.json") as f:
        manifest = json.load(f)
    files = [f"{path}/{p['file']}" for p in manifest["pages"]]
    if not files:
        return spark.createDataFrame([], _FULL_SCHEMA)
    return spark.read.json(files)
