"""Spark 4 Python Data Source connector for SAS7BDAT (uncompressed u64
subset): ``spark.read.format("sas_lite").load(path)``.

This is the DISTRIBUTED ingest path that `scan_sas`'s driver-side staging
explicitly lacks (its docstring calls SAS landing "inherently a driver-side
single-file ingest"): the official Python Data Source API (SPARK-44076,
pyspark.sql.datasource) lets the engine split a non-splittable-looking
binary format on its OWN internal structure — one InputPartition per SAS
data page, each task seeking straight to its page and decoding
independently (sources/sas7bdat_reader.read_page_columns). Schema is
derived from the meta page on the driver; executors never parse metadata.

Scale notes: a 100 TB SAS estate is many files x many pages; partitions()
enumerates pages from the meta page alone (one tiny read per file), so
planning cost is O(files), and tasks touch exactly page_size bytes each —
the same alignment a parquet row-group reader gets. Reference parity: the
reference's entire raw layer is pd.read_sas('hn22_all.sas7bdat')
(1-1.data_processing.ipynb:54-55) — single-threaded, whole-file; this
connector is that ingest re-expressed as a first-class Spark source.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)


class SasPagePartition(InputPartition):
    """A contiguous RANGE of data pages [start, end) — one task's unit.

    r07: one-partition-per-page scheduled ~1200 tasks for a 19 MB file
    (~0.3s scheduling + python-worker round trip each, 14s wall); pages
    stay the split ATOMS but are grouped into ranges sized from
    ``spark.sql.files.maxPartitionBytes`` — the same coalescing contract a
    parquet row-group reader gets — floored so a small file still fans out
    to ``defaultParallelism`` tasks."""

    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SasLiteDataSource(DataSource):
    """format("sas_lite") — options: path (required)."""

    @classmethod
    def name(cls) -> str:
        return "sas_lite"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("sas_lite requires a path")
        return path

    def schema(self) -> str:
        from .sas7bdat_reader import read_meta

        meta = read_meta(self._path())
        return ", ".join(
            f"{c.name} {'double' if c.ctype == 1 else 'string'}"
            for c in meta.columns
        )

    def reader(self, schema) -> "SasLiteReader":
        # Python data sources plan inside a python worker process with no
        # session, so split sizing arrives via OPTIONS (callers forward
        # spark.sql.files.maxPartitionBytes / defaultParallelism — see
        # read_sas_lite); defaults: 128 MiB and the bench's
        # SPARK_GRAFT_CPUS contract.
        import os

        max_bytes = int(
            str(self.options.get("max_partition_bytes", 134217728))
            .lower()
            .rstrip("b")
        )
        par = int(
            self.options.get(
                "parallelism", os.environ.get("SPARK_GRAFT_CPUS", "32")
            )
        )
        return SasLiteReader(self._path(), max_bytes, par)

    def writer(self, schema, overwrite: bool) -> "SasLiteWriter":
        # Declared layout: every task must agree on string widths WITHOUT
        # seeing other tasks' data (the driver-side write_sas7bdat derives
        # widths from the whole column; a distributed writer cannot).
        spec: list[tuple[str, int]] = []
        for field in schema.fields:
            t = field.dataType.typeName()
            if t == "double":
                spec.append((field.name, 0))
            elif t == "string":
                w = self.options.get(f"width_{field.name.lower()}")
                if not w:
                    raise ValueError(
                        f"sas_lite write requires option width_{field.name}"
                        " for string columns (declared fixed width)"
                    )
                spec.append((field.name, int(w)))
            else:
                raise ValueError(
                    f"sas_lite writes double/string columns only, got {t}"
                )
        page_size = int(self.options.get("page_size", "16384"))
        return SasLiteWriter(self._path(), spec, page_size, overwrite)


class SasLiteReader(DataSourceReader):
    def __init__(self, path: str, max_bytes: int, parallelism: int):
        self.path = path
        self.max_bytes = max_bytes
        self.parallelism = parallelism

    def partitions(self):
        from .sas7bdat_reader import read_meta

        meta = read_meta(self.path)
        pages = meta.data_page_indices
        total = len(pages) * meta.page_size
        target = max(
            meta.page_size,
            min(self.max_bytes, -(-total // max(self.parallelism, 1))),
        )
        step = max(1, target // meta.page_size)
        return [
            SasPagePartition(pages[i], min(pages[i] + step, pages.stop))
            for i in range(0, len(pages), step)
        ]

    def read(self, partition: SasPagePartition):
        # Executor side: decode one page RANGE (single contiguous file
        # read), emit one Arrow batch — vectorized hand-off, no per-row
        # Python tuples.
        from .sas7bdat_reader import read_meta, read_page_range_batch

        meta = read_meta(self.path)
        yield read_page_range_batch(self.path, meta, partition.start, partition.end)


class SasPartCommit(WriterCommitMessage):
    """Per-task result: where the task's pages landed and how many."""

    def __init__(self, part_file: str, n_rows: int, n_pages: int, pid: int):
        self.part_file = part_file
        self.n_rows = n_rows
        self.n_pages = n_pages
        self.pid = pid


class SasLiteWriter(DataSourceArrowWriter):
    """Distributed SAS sink with the writer API's two-phase commit: each
    task encodes ITS rows into whole DATA pages (partial last page —
    block_count makes that legal SAS) and stages them as a part file;
    commit() writes header+meta (now knowing the global row/page totals)
    and concatenates parts in partition order, then atomically renames.
    abort() removes the staged parts — a failed job leaves no torn file.
    Part files live next to the destination, so on a real cluster the
    path must be shared storage — the same contract as any file sink."""

    def __init__(
        self, path: str, spec: list, page_size: int, overwrite: bool
    ):
        self.path = path
        self.spec = spec
        self.page_size = page_size
        self.overwrite = overwrite

    def write(self, batches) -> SasPartCommit:
        import os
        import uuid

        import pyarrow as pa

        from pyspark import TaskContext

        from .sas7bdat_lite import (
            build_data_page,
            encode_rowmat_arrow,
            layout_from_spec,
            rows_per_page,
        )

        col_meta, row_length = layout_from_spec(self.spec)
        rpp = rows_per_page(self.page_size, row_length)
        names = [n for n, _ in self.spec]
        blist = list(batches)
        empty_schema = pa.schema(
            [(n, pa.float64() if w <= 0 else pa.string()) for n, w in self.spec]
        )
        tbl = (
            pa.Table.from_batches(blist)
            if blist
            else empty_schema.empty_table()
        )
        nrows = tbl.num_rows
        # arrow-native row-matrix encode (optimization r07): straight from
        # the record batches' buffers, no to_pylist / per-row padding loop
        rowmat = encode_rowmat_arrow(tbl, self.spec, col_meta)
        pid = TaskContext.get().partitionId()
        part_file = f"{self.path}.part-{pid:05d}-{uuid.uuid4().hex[:8]}"
        n_pages = (nrows + rpp - 1) // rpp if nrows else 0
        with open(part_file, "wb") as f:
            for p in range(n_pages):
                lo, hi = p * rpp, min(nrows, (p + 1) * rpp)
                f.write(build_data_page(rowmat[lo:hi], self.page_size))
        _ = names  # layout order == spec order == schema order
        return SasPartCommit(part_file, nrows, n_pages, pid)

    def commit(self, messages) -> None:
        import os

        from .sas7bdat_lite import build_header, build_meta_page, layout_from_spec

        parts = sorted(
            (m for m in messages if m is not None), key=lambda m: m.pid
        )
        col_meta, row_length = layout_from_spec(self.spec)
        n_rows = sum(m.n_rows for m in parts)
        n_pages = sum(m.n_pages for m in parts)
        if os.path.exists(self.path) and not self.overwrite:
            raise FileExistsError(self.path)
        tmp = self.path + ".assembling"
        with open(tmp, "wb") as out:
            out.write(build_header(self.page_size, 1 + n_pages))
            out.write(
                build_meta_page(
                    [n for n, _ in self.spec],
                    col_meta,
                    row_length,
                    n_rows,
                    self.page_size,
                )
            )
            for m in parts:
                with open(m.part_file, "rb") as f:
                    out.write(f.read())
                os.unlink(m.part_file)
        os.replace(tmp, self.path)

    def abort(self, messages) -> None:
        import os

        for m in messages or []:
            if m is not None:
                try:
                    os.unlink(m.part_file)
                except OSError:
                    pass


def register(spark) -> None:
    """Idempotent session registration of format('sas_lite')."""
    spark.dataSource.register(SasLiteDataSource)


def read_sas_lite(spark, path: str):
    """spark.read.format('sas_lite') with the session's split sizing
    forwarded as options (the python-worker planner cannot see session
    conf): maxPartitionBytes caps a partition, defaultParallelism floors
    the fan-out for small files."""
    return (
        spark.read.format("sas_lite")
        .option(
            "max_partition_bytes",
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b"),
        )
        .option("parallelism", spark.sparkContext.defaultParallelism)
        .load(path)
    )
