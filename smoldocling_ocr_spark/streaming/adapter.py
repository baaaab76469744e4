"""Structured Streaming adapter for the extraction pipeline.

``readStream`` on a documents-shaped source → the same fused extraction
stage → ``foreachBatch`` sink. Because extraction is stateless per url, no
watermark or state store is required; exactly-once lands on the sink's
idempotent write (append by url + downstream MERGE/anti-join, the same
resume contract as batch).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.pipeline import extract_documents


def extract_stream(stream_docs: DataFrame) -> DataFrame:
    """Streaming documents DataFrame → streaming extracted DataFrame.

    ``mapInPandas`` is a stateless projection, so the fused pipeline applies
    to a streaming relation unchanged (salting is skipped — repartition of a
    stream would force a shuffle per microbatch; source partitioning rules)."""
    return extract_documents(stream_docs, salt=False)


def start_extract_stream(
    stream_docs: DataFrame,
    output_path: str,
    checkpoint_path: str,
    batch_hook: Callable[[DataFrame, int], None] | None = None,
) -> StreamingQuery:
    """Start the extraction stream writing parquet per microbatch."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_path)
        if batch_hook is not None:
            batch_hook(batch_df, batch_id)

    return (
        extract_stream(stream_docs)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
