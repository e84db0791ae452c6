"""Streaming deduplication: exact-content first-occurrence filtering.

A training-data ingest stream wants every distinct document exactly once.
Structured Streaming's ``dropDuplicates`` on a content hash is the
idiomatic operator: per-key state is one marker, output is append-mode, and
``dropDuplicatesWithinWatermark`` bounds state for time-bounded duplicate
horizons (the 100 TB knob — unbounded dedup state across an infinite
stream is a design smell; near-dup streams should window their horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_exact_dedup"]


def streaming_exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Keep the first row per exact content (md5 of ``text_col``) across
    the whole stream; duplicates in later micro-batches are dropped by
    keyed state.

    With ``event_time_col`` + ``watermark`` (e.g. ``"10 minutes"``), state
    is bounded via ``dropDuplicatesWithinWatermark`` — duplicates are only
    suppressed within the watermark horizon, the right trade at unbounded
    scale. Without them, state grows O(distinct contents) (exactly the
    batch semantics of ``operators.dedup.exact_dedup``'s keeper set).

    Batch inputs get the one-shot equivalent (first row per hash by a
    deterministic order) so pipelines develop in batch and deploy
    streaming unchanged.
    """
    hashed = df.withColumn("content_hash", F.md5(F.col(text_col)))
    if not df.isStreaming:
        from pyspark.sql.window import Window

        order = [F.col(c) for c in df.columns]
        w = Window.partitionBy("content_hash").orderBy(*order)
        return (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    if event_time_col and watermark:
        return hashed.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])
