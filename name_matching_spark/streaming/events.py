"""Streaming ingestion of an events table: watermarked windowed aggregation
and incremental blocking-key extraction.

The reference has NO streaming surface (SURVEY.md §2.10) — this is the
engine extension for continuously-arriving records: the same normalization /
blocking-key derivation applied through ``readStream``, plus tumbling-window
event rollups with late-data handling.

The transformations are defined against a schema, not a source, so the same
function serves batch DataFrames and streaming DataFrames (Structured
Streaming's unified model); tests drive them with a file source + memory
sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "windowed_event_counts",
    "sliding_event_counts",
    "session_event_counts",
    "streaming_blocking_keys",
]


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts + value sums per event type with a watermark
    bounding state for late data. Works on both batch and streaming inputs
    (watermark is a no-op in batch)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(type_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(type_col),
            "n_events",
            "sum_value",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Sliding (hopping) window counts per event type — each event lands in
    ``window/slide`` overlapping windows. Batch + streaming unified; the
    watermark bounds state on streams."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.window(F.col(ts_col), window_duration, slide_duration).alias("w"),
            F.col(type_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(type_col),
            "n_events",
        )
    )


def session_event_counts(
    events: DataFrame,
    gap_duration: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Session windows per key: events closer than ``gap_duration`` merge
    into one session (dynamic, data-driven window bounds — the shape
    activity/bot-detection pipelines need). Batch + streaming unified."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap_duration).alias("w"),
            F.col(key_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(key_col),
            "n_events",
        )
    )


def streaming_blocking_keys(records: DataFrame) -> DataFrame:
    """Incremental normalize + blocking-key derivation for arriving records —
    the streaming front half of the linkage pipeline (key extraction is
    stateless, so it runs identically under readStream; the pairwise join
    stage remains a periodic batch job over the keyed store)."""
    from name_matching_spark.operators.blocking import blocking_key_column
    from name_matching_spark.operators.normalize import normalize_records

    norm = normalize_records(records)
    return norm.withColumn("block_key", blocking_key_column("phonetic"))
