"""Catalog seam: one place that decides Iceberg vs plain parquet.

The north rule targets Iceberg tables; this sandbox has no Iceberg runtime
jar, so the seam (SURVEY.md §7 risk (e)) writes identical-schema parquet
datasets with dynamic partition overwrite — the property checkpoint/resume
needs (re-running a partition replaces exactly that partition's files).  On a
cluster with an Iceberg catalog, ``TableIO(catalog="my_catalog.db")`` switches
every read/write to ``writeTo(...).overwritePartitions()`` with no caller
changes.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

# DDL atom → pyarrow type for the driver-side writers below
_PA_TYPES = {"string": "string", "int": "int32", "long": "int64", "double": "float64"}


def arrow_local_df(spark: SparkSession, rows: list[tuple], ddl: str):
    """Small driver-local rows → DataFrame via pandas + Arrow.

    ``spark.createDataFrame(list_of_tuples)`` builds a Python-RDD-backed
    frame: every broadcast of it (or of anything derived from it) then
    materializes through a multi-task Python pickle/conversion job —
    measured ~0.5 s per broadcast at 4 cores (r6).  The pandas path with
    Arrow enabled ships one JVM-deserialized Arrow batch instead, so
    broadcast builds over these relations cost milliseconds.  DDL supports
    the same scalar atoms as the driver-side writers above; numeric
    columns must be null-free (the driver-compiled batches that use this
    always are).
    """
    import numpy as np
    import pandas as pd

    _NP = {"string": object, "long": np.int64, "int": np.int32, "double": np.float64}
    names, dtypes = [], []
    for part in ddl.split(","):
        name, typ = part.strip().rsplit(" ", 1)
        names.append(name)
        dtypes.append(_NP[typ])
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    pdf = pd.DataFrame(
        {
            n: (list(c) if d is object else np.asarray(c, dtype=d))
            for n, d, c in zip(names, dtypes, cols)
        },
        columns=names,
    )
    return spark.createDataFrame(pdf, ddl)


def _pa_schema(ddl: str):
    import pyarrow as pa

    fields = []
    for part in ddl.split(","):
        name, typ = part.strip().rsplit(" ", 1)
        fields.append(pa.field(name, getattr(pa, _PA_TYPES[typ])()))
    return pa.schema(fields)


class TableIO:
    def __init__(self, spark: SparkSession, root: str, catalog: str | None = None):
        self.spark = spark
        self.root = root.rstrip("/")
        self.catalog = catalog

    def path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def exists(self, name: str, committed: bool = False) -> bool:
        """``committed=True`` additionally requires the ``_SUCCESS`` job-commit
        marker — use it for tables that gate a skip-if-present checkpoint, so a
        build that crashed mid-write re-runs the stage instead of trusting the
        partially-committed files a v2 committer leaves behind.  (Not valid for
        the driver-side pyarrow writers, which emit no marker.)"""
        if self.catalog:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        # Hadoop FileSystem probe, not spark.read.parquet(...).schema: the
        # read-based probe builds a full scan relation (directory listing +
        # parquet footer reads — at 10^12-file scale a real cost) and logs a
        # PATH_NOT_FOUND stack trace on every fresh build.  fs.exists is one
        # metadata RPC and works for any Hadoop-compatible URI (file/hdfs/s3a).
        jvm = self.spark._jvm
        probe = self.path(name) + "/_SUCCESS" if committed else self.path(name)
        hpath = jvm.org.apache.hadoop.fs.Path(probe)
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return bool(fs.exists(hpath))

    def read(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.read.table(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self.path(name))

    def overwrite_partitions(self, df: DataFrame, name: str, partition_col: str) -> None:
        """Idempotent partition-scoped write: replaces exactly the partitions
        present in ``df``, leaves all others untouched (the resume primitive)."""
        if self.catalog:
            full = f"{self.catalog}.{name}"
            if not self.spark.catalog.tableExists(full):
                df.writeTo(full).partitionedBy(partition_col).create()
            else:
                df.writeTo(full).overwritePartitions()
            return
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(self.path(name))
        )

    def overwrite(self, df: DataFrame, name: str) -> None:
        if self.catalog:
            df.writeTo(f"{self.catalog}.{name}").createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self.path(name))

    def append(self, df: DataFrame, name: str) -> None:
        if self.catalog:
            full = f"{self.catalog}.{name}"
            if not self.spark.catalog.tableExists(full):
                df.writeTo(full).create()
            else:
                df.writeTo(full).append()
        else:
            df.write.mode("append").parquet(self.path(name))

    def write_bucketed(
        self,
        df: DataFrame,
        name: str,
        bucket_col: str = "term",
        n_buckets: int = 64,
        sort: bool = True,
    ) -> None:
        """Hash-bucketed, bucket-sorted table write (co-located join layout).

        Two tables bucketed on the same column with the same bucket count
        join WITHOUT an exchange on either side — the layout a 100 TB
        deployment gives its postings + term_stats tables so every
        term-keyed join (stats refresh, index merge, analytics) skips the
        shuffle entirely (plan pinned in tests/test_plans.py).  Iceberg's
        equivalent is a ``bucket(N, col)`` partition transform; parquet mode
        uses the session catalog (``saveAsTable`` with an explicit path —
        bucket metadata lives in the metastore, which is why a plain
        ``.parquet()`` write cannot express this).
        """
        writer = (
            df.write.format("parquet")
            .option("path", self.path(name))
            .bucketBy(n_buckets, bucket_col)
        )
        if sort:
            writer = writer.sortBy(bucket_col)
        writer.mode("overwrite").saveAsTable(name)

    def append_rows(self, rows: list[tuple], schema_ddl: str, name: str) -> None:
        """Append DRIVER-LOCAL rows (metrics/lineage — always tiny) as one
        parquet file, no Spark job: a metrics append costs ~300 ms of job
        launch + commit through the executor path, ×4+ per build — pure
        orchestration overhead for 10-row tables.  The file is fully written
        before return, so it is the same commit point the Spark append was.
        Catalog mode keeps the engine (Iceberg appends are metadata ops)."""
        if self.catalog:
            self.append(self.spark.createDataFrame(rows, schema_ddl), name)
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = _pa_schema(schema_ddl)
        cols = list(zip(*rows)) if rows else [[] for _ in schema.names]
        table = pa.table(
            {f.name: pa.array(list(c), type=f.type) for f, c in zip(schema, cols)}
        )
        d = self.path(name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(table, f"{d}/part-{uuid.uuid4().hex}.parquet")

    def overwrite_rows(self, rows: list[tuple], schema_ddl: str, name: str) -> None:
        """Overwrite a table with DRIVER-LOCAL rows (e.g. the 1-row corpus
        scalars) — same no-Spark-job rationale as append_rows."""
        if self.catalog:
            self.overwrite(self.spark.createDataFrame(rows, schema_ddl), name)
            return
        import shutil

        d = self.path(name)
        shutil.rmtree(d, ignore_errors=True)
        self.append_rows(rows, schema_ddl, name)
