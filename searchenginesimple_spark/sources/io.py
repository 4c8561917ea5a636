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

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, spark: SparkSession, root: str, catalog: str | None = None):
        self.spark = spark
        self.root = root.rstrip("/")
        self.catalog = catalog

    def path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def exists(self, name: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        try:
            self.spark.read.parquet(self.path(name)).schema
            return True
        except Exception:
            return False

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
