"""spark-submit entry point for the extraction pipeline.

Cluster usage (BASELINE.json:6/14 — multi-executor, resumable):

    zip -r dm.zip datamunging_spark
    spark-submit --py-files dm.zip \
        --conf spark.sql.adaptive.enabled=true \
        -m datamunging_spark  # or: path/to/__main__.py
        --input  lake.volumes          # Iceberg table or parquet path
        --output /data/volumes_out     # output+checkpoint table
        --run-id run-2026-08-16 \
        --partitions 4096 --salt 7

Locally (the sandbox): paths are parquet directories.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="datamunging_spark")
    p.add_argument("--input", required=True, help="spans table (parquet path)")
    p.add_argument("--output", required=True, help="output table path (also the checkpoint)")
    p.add_argument("--run-id", required=True)
    p.add_argument(
        "--job",
        choices=["munge", "extract"],
        default="munge",
        help="munge = OCR correction cascade; extract = HTML/PDF main-content extraction",
    )
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--salt", type=int, default=0)
    p.add_argument("--master", default=None, help="override master (default: spark-submit's)")
    args = p.parse_args(argv)

    from .pipeline import run_extract_pipeline, run_pipeline
    from .session import get_spark

    spark = get_spark(app_name=f"{args.job}-{args.run_id}", master=args.master)
    input_df = spark.read.parquet(args.input)
    if args.job == "munge":
        res = run_pipeline(
            spark,
            input_df,
            args.output,
            run_id=args.run_id,
            partitions=args.partitions,
            salt=args.salt,
        )
        print(
            f"run={res.run_id} docs={res.docs_processed} pages={res.pages} "
            f"tokens_corrected={res.tokens_corrected}"
        )
    else:
        res = run_extract_pipeline(
            spark,
            input_df,
            args.output,
            run_id=args.run_id,
            partitions=args.partitions,
            salt=args.salt,
        )
        print(
            f"run={res.run_id} docs={res.docs_processed} "
            f"html_blocks={res.html_blocks_kept} pdf_lines={res.pdf_lines_kept} "
            f"chars_out={res.chars_out}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
