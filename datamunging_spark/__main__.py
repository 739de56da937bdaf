"""spark-submit entry point for the extraction pipeline.

Cluster usage (BASELINE.json:6/14 — multi-executor, resumable):

    zip -r dm.zip datamunging_spark
    spark-submit --py-files dm.zip \
        --conf spark.sql.adaptive.enabled=true \
        tools/submit.py \
        --input  lake.volumes          # Iceberg table or parquet path
        --output /data/volumes_out     # output+checkpoint table
        --run-id run-2026-08-16 \
        --partitions 4096 --salt 7

(``tools/submit.py`` is the primary-script shim — spark-submit runs its
primary file without a package parent, so this module's relative imports
can't be the entry; verified end-to-end by ``tests/test_submit.py``.)

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
        choices=["munge", "extract", "stream-munge", "stream-extract"],
        default="munge",
        help=(
            "munge = OCR correction cascade; extract = HTML/PDF "
            "main-content extraction; stream-* = incremental foreachBatch "
            "ingest of newly-arrived span files (checkpointed, restart-safe)"
        ),
    )
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--salt", type=int, default=0)
    p.add_argument(
        "--checkpoint",
        default=None,
        help="streaming checkpoint dir (stream-* jobs; default <output>_ckpt)",
    )
    p.add_argument("--master", default=None, help="override master (default: spark-submit's)")
    args = p.parse_args(argv)

    from .pipeline import run_extract_pipeline, run_pipeline
    from .session import get_spark

    spark = get_spark(app_name=f"{args.job}-{args.run_id}", master=args.master)

    if args.job.startswith("stream-"):
        from .streaming.jobs import run_streaming_extract, run_streaming_munge

        runner = (
            run_streaming_munge if args.job == "stream-munge" else run_streaming_extract
        )
        ckpt = args.checkpoint or f"{args.output}_ckpt"
        runner(spark, args.input, args.output, ckpt)
        from .pipeline import read_output

        print(f"run={args.run_id} docs={read_output(spark, args.output).count()}")
        spark.stop()
        return 0

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
