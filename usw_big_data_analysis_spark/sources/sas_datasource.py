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
    def __init__(self, page_index: int):
        self.page_index = page_index


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
        return SasLiteReader(self._path())

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
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        from .sas7bdat_reader import read_meta

        meta = read_meta(self.path)
        return [SasPagePartition(p) for p in meta.data_page_indices]

    def read(self, partition: SasPagePartition):
        # Executor side: decode exactly one page, emit one Arrow batch —
        # vectorized hand-off, no per-row Python tuples.
        import pyarrow as pa

        from .sas7bdat_reader import read_meta, read_page_columns

        meta = read_meta(self.path)
        cols = read_page_columns(self.path, meta, partition.page_index)
        arrays = [
            pa.array(cols[c.name])
            if c.ctype == 1
            else pa.array(cols[c.name], type=pa.string())
            for c in meta.columns
        ]
        yield pa.RecordBatch.from_arrays(arrays, [c.name for c in meta.columns])


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

        import numpy as np
        import pyarrow as pa

        from pyspark import TaskContext

        from .sas7bdat_lite import (
            build_data_page,
            encode_rowmat,
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
        arrays = [
            tbl.column(n).to_numpy(zero_copy_only=False)
            if w <= 0
            else np.asarray(tbl.column(n).to_pylist(), dtype=object)
            for n, w in self.spec
        ]
        nrows = len(arrays[0]) if arrays else 0
        rowmat = encode_rowmat(arrays, col_meta)
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
