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


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    target: str,
    key: str = "doc_id",
    io=None,
) -> None:
    """Keyed upsert: rows in ``updates`` replace same-key rows in the
    target table; new keys append. The re-munge/backfill primitive (a
    corrected batch of volumes supersedes its previous output).

    Parquet backend: read target → anti-join out the updated keys →
    union the updates → write to a temp path → swap into place.
    Correct but rewrites the table, so it is for LOCAL/test use and
    small state tables only.

    Iceberg backend (real cluster) does this as one transactional
    row-level command — no table rewrite, snapshot-isolated:

        MERGE INTO lake.db.tbl t
        USING updates u ON t.doc_id = u.doc_id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *

    which we emit via SQL when the io is Iceberg-backed (updates are
    registered as a temp view). Copy-on-write vs merge-on-read is a
    table property (``write.merge.mode``), not engine code.
    """
    io = io or default_io()
    # Iceberg MERGE rejects duplicate update keys (cardinality
    # violation) while a naive parquet rewrite would silently append
    # both rows — enforce the same key-unique contract on both backends
    # so they stay semantically identical.
    dup = (
        updates.groupBy(key)
        .count()
        .where("count > 1")
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"merge_upsert: updates contain duplicate {key}="
            f"{dup[0][0]!r}; MERGE semantics require one row per key"
        )
    if isinstance(io, IcebergTableIO):
        import uuid

        view = f"_merge_updates_{uuid.uuid4().hex}"
        updates.createOrReplaceTempView(view)
        try:
            spark.sql(
                f"MERGE INTO {target} t USING {view} u "
                f"ON t.{key} = u.{key} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        finally:
            spark.catalog.dropTempView(view)
        return
    if io.exists(spark, target):
        current = io.read(spark, target)
        from pyspark.sql import functions as F

        kept = current.join(
            F.broadcast(updates.select(key).distinct()), key, "left_anti"
        )
        merged = kept.unionByName(updates)
    else:
        merged = updates
    # Crash-safe swap: the merged result is fully written to a TEMP
    # directory first (reading the live target while writing elsewhere —
    # no localCheckpoint needed, no window where the target is truncated
    # mid-job), then moved into place with two directory renames. An
    # executor/driver loss during the write leaves the target untouched;
    # the only remaining non-atomic window is between the two renames
    # below (two syscalls, no Spark work), vs. the entire merge job
    # under the old read-truncate-overwrite. True single-rename
    # atomicity is the Iceberg branch's job (snapshot commit).
    import shutil
    import uuid

    nonce = uuid.uuid4().hex
    tmp, trash = f"{target}.__tmp_{nonce}", f"{target}.__old_{nonce}"
    io.overwrite(merged, tmp)
    try:
        had_old = os.path.isdir(target)
        if had_old:
            os.rename(target, trash)
        os.rename(tmp, target)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    if had_old:
        shutil.rmtree(trash, ignore_errors=True)


def default_io() -> ParquetTableIO:
    return ParquetTableIO()
