"""TSV feature sink + source — parity with the reference's R16 output
(per-volume tab-separated token-count features written next to the
corrected text; SURVEY.md §2.1 R16).

The big-data output stays parquet/Iceberg (pipeline.py); this sink is
the interchange format for downstream single-node tooling that consumed
the reference's TSVs. Spark's csv writer is used with an explicit
schema-stable column list, one file per partition (coalesce for a
single file is the caller's choice — at 10^12 docs you do NOT want one
file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FEATURE_COLUMNS = [
    "doc_id",
    "pages",
    "tokens_total",
    "tokens_in_dict",
    "tokens_corrected",
    "header_lines_removed",
    "pagenum_lines_removed",
]


def write_features_tsv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Write the munge output's per-volume feature columns as TSV with a
    header row. ``single_file`` coalesces to one file (small corpora /
    test fixtures only)."""
    out = df.select(*[c for c in FEATURE_COLUMNS if c in df.columns])
    if single_file:
        out = out.coalesce(1)
    (
        out.write.mode("overwrite")
        .option("sep", "\t")
        .option("header", "true")
        .csv(path)
    )


def read_features_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Round-trip reader (schema inferred from the header + types)."""
    return (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .option("inferSchema", "true")
        .csv(path)
    )
