"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline end-to-end on the
sf0.001 tier; ``queries()`` / ``oracle_sql()`` expose the operator catalog
(smoldocling_ocr_spark.plans.catalog) for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full extract-to-markdown over the CC-style corpus
    synthesized at sf0.001 scale (seed=42), returning the extracted table."""
    from smoldocling_ocr_spark.sources.documents import read_cc_documents
    from smoldocling_ocr_spark.operators.pipeline import extract_documents

    docs = read_cc_documents(spark, "/root/testdata/sf0.001")
    return extract_documents(docs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data ops: dedup, similarity search, text analysis)."""
    from smoldocling_ocr_spark.plans.catalog import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each queries() key (omitted only for
    genuinely non-SQL-expressible ops → rows-only check)."""
    from smoldocling_ocr_spark.plans.catalog import oracle_queries

    return oracle_queries()
