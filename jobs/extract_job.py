"""spark-submit entry point for the extraction pipeline.

Usage (cluster):
    python jobs/make_pyfiles.py dist/deps.zip
    spark-submit --py-files dist/deps.zip jobs/extract_job.py \
        --input  <documents table path/URI> \
        --output <extracted table path>    \
        --lineage <lineage table path>     \
        [--resume]          # anti-join urls already present in --output
        [--partitions N]    # salted repartition width (default 2x parallelism)

The package is pure Python (stdlib + pyspark/pandas/numpy which executors
already have), so the deps zip is all that ships — no native wheels
(SURVEY.md §4.1 item 7).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="extract documents to markdown")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--lineage", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--partitions", type=int, default=None)
    parser.add_argument("--cores", default=None, help="local[N] cores (local mode only)")
    args = parser.parse_args(argv)

    from smoldocling_ocr_spark.operators.lineage import extraction_lineage, extraction_metrics
    from smoldocling_ocr_spark.operators.pipeline import extract_documents, split_by_tier
    from smoldocling_ocr_spark.session import get_spark

    spark = get_spark(app_name="extract_job", cores=args.cores)

    docs = spark.read.parquet(args.input)
    already = None
    if args.resume:
        try:
            already = spark.read.parquet(args.output).select("url")
        except Exception:
            already = None  # first run — nothing extracted yet

    normal, oversized = split_by_tier(docs)
    extracted = extract_documents(normal, num_partitions=args.partitions, already_extracted=already)
    extracted.write.mode("append").parquet(args.output)

    # dedicated low-parallelism pass for oversized payloads (north_rule)
    if oversized.limit(1).count():
        big = extract_documents(oversized, num_partitions=4, already_extracted=already)
        big.write.mode("append").parquet(args.output)

    result = spark.read.parquet(args.output)
    if args.lineage:
        # lineage over the WRITTEN table: certifies exactly which partitions
        # committed (north_rule checkpoint-resume), no second input scan
        extraction_lineage(result).write.mode("append").parquet(args.lineage)

    extraction_metrics(result).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
