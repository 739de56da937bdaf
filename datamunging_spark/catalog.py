"""Table IO seam: parquet locally, Iceberg on a real cluster.

The Iceberg runtime jars are not in this sandbox (no network — SURVEY.md
§7), so the local backend is parquet with the SAME append/read/exists
semantics. On a cluster, instantiate ``IcebergTableIO`` after configuring:

    spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lake.type = hive   (or hadoop / rest)
    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>

Iceberg gives atomic multi-file appends + snapshot isolation, which makes
the pipeline's output-table-as-checkpoint protocol (pipeline.py) fully
transactional; the parquet backend approximates it with the Hadoop
FileOutputCommitter (see pipeline.py docstring for the exact guarantees).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ParquetTableIO:
    """Parquet-backed tables addressed by directory path."""

    def exists(self, spark: SparkSession, path: str) -> bool:
        # _SUCCESS marks at least one committed Spark write job
        if os.path.isdir(path):
            return any(f.endswith(".parquet") for f in os.listdir(path))
        return False

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)

    def append(self, df: DataFrame, path: str) -> None:
        df.write.mode("append").parquet(path)

    def overwrite(self, df: DataFrame, path: str) -> None:
        df.write.mode("overwrite").parquet(path)


class IcebergTableIO:
    """Iceberg-backed tables addressed by catalog table name.

    Untested in this sandbox (jars unavailable offline); the method
    surface mirrors ParquetTableIO so pipeline code is backend-agnostic.
    """

    def exists(self, spark: SparkSession, table: str) -> bool:
        return spark.catalog.tableExists(table)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.format("iceberg").load(table)

    def append(self, df: DataFrame, table: str) -> None:
        df.writeTo(table).append()

    def overwrite(self, df: DataFrame, table: str) -> None:
        df.writeTo(table).createOrReplace()


def default_io() -> ParquetTableIO:
    return ParquetTableIO()
