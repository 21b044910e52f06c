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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


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


def register(spark) -> None:
    """Idempotent session registration of format('sas_lite')."""
    spark.dataSource.register(SasLiteDataSource)
