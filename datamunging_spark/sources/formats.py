"""Columnar/row source-format surface beyond parquet: ORC, CSV with an
explicit schema, and a gated Avro seam.

The reference reads pairtree+zip page files and TSVs only (SURVEY.md
§2.1 R1/R16); a Spark-native engine is expected to ingest whatever the
lake already holds. Scale rules encoded here:

- **Explicit schemas, never inference, on the big-data path.** Schema
  inference scans the input once before the real job (2× IO at 100 TB)
  and can silently flip a column's type between runs; these readers
  take a DDL string or StructType and hand Spark a fixed schema, so a
  drifted file fails loudly instead of corrupting downstream.
- **ORC round-trips nested span structs** (array<struct>) exactly like
  parquet — both are fully supported by vectorized readers; pick by
  what the lake standardizes on.
- **Avro needs the ``spark-avro`` external module** (not bundled in
  this sandbox's distro, no network): the functions exist, raise a
  clear error locally, and work unchanged on a cluster launched with
  ``--packages org.apache.spark:spark-avro_2.13:<spark-version>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (built-in vectorized reader; predicate pushdown and
    column pruning work exactly as with parquet)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """CSV with a MANDATORY explicit schema (DDL string or StructType).

    ``mode=FAILFAST`` so a malformed row kills the job instead of
    becoming a silent null — at 10^12 rows, silent nulls are data loss
    you find weeks later. For quarantine-style ingestion switch to
    PERMISSIVE + ``columnNameOfCorruptRecord`` and route the corrupt
    column to a dead-letter table.
    """
    return (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .csv(path)
    )


_AVRO_PROBED: dict[int, bool] = {}


def _require_avro(spark: SparkSession) -> None:
    """Capability probe: try to RESOLVE the avro data source instead of
    string-parsing private JVM state (listJars().toString() abbreviates
    long collections and jar URIs may contain commas — both misreport).
    A load on a nonexistent path forces DataSource resolution: if the
    module is absent Spark raises its dedicated 'Failed to find data
    source: avro' analysis error (mapped to NotImplementedError here);
    any OTHER error (path not found) proves the module resolved, and
    the real read/write proceeds. Probed once per SparkSession."""
    key = id(spark)
    if key not in _AVRO_PROBED:
        try:
            spark.read.format("avro").load(
                "/__datamunging_avro_capability_probe__"
            )
            _AVRO_PROBED[key] = True  # pragma: no cover — empty-glob success
        except Exception as e:  # noqa: BLE001 — classify by message
            msg = str(e)
            _AVRO_PROBED[key] = not (
                "Failed to find data source" in msg
                or "FAILED_TO_LOAD_DATA_SOURCE" in msg
                or "ClassNotFoundException" in msg
            )
    if not _AVRO_PROBED[key]:
        raise NotImplementedError(
            "Avro IO needs the spark-avro external module, which is not "
            "bundled in this sandbox (no network). On a cluster: "
            "spark-submit --packages org.apache.spark:spark-avro_2.13:<ver>"
        )


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    _require_avro(spark)
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    _require_avro(df.sparkSession)
    df.write.mode(mode).format("avro").save(path)
