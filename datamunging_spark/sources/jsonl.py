"""JSONL corpus sources — the common web-scale interchange format.

Two shapes are supported, both with explicit schemas (never inference —
at 10^12 docs schema inference is a full extra pass):

1. ``read_jsonl_spans``: one document per line already in the engine's
   interleaved-span shape::

       {"doc_id": "...", "spans": [{"kind": "page", "text": "...",
        "media_ref": "", "offset": 0}, ...]}

2. ``read_jsonl_pages``: one PAGE per line (how crawl/OCR dumps usually
   arrive), assembled into ordered span arrays with one aggregation::

       {"doc_id": "...", "page_no": 3, "text": "...",
        "media_ref": null, "kind": "page"}

   Assembly is the relational form of R2 (SURVEY.md §2.1):
   ``groupBy(doc_id) → array_sort(collect_list(struct(...)))`` — one
   shuffle keyed on doc_id, which the downstream munge repartition then
   reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..operators.munge import INPUT_SCHEMA

PAGE_LINE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
    ]
)


def read_jsonl_spans(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(INPUT_SCHEMA).json(path)


def read_jsonl_pages(spark: SparkSession, path: str) -> DataFrame:
    lines = spark.read.schema(PAGE_LINE_SCHEMA).json(path)
    span = F.struct(
        F.coalesce(F.col("kind"), F.lit("page")).alias("kind"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.coalesce(F.col("media_ref"), F.lit("")).alias("media_ref"),
        F.col("page_no").cast("int").alias("offset"),
    )
    return (
        lines.select("doc_id", span.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("s.offset").alias("o"), F.col("s").alias("s")))
                ),
                lambda x: x["s"],
            ).alias("spans")
        )
    )
