"""Streaming incremental linkage: micro-batches of new records assigned to
their best anchors in a (batch) base corpus via ``foreachBatch``.

North-rule extension — the reference links static tables only; a live
intake (registrations, uploads, events) wants each arriving record matched
against the existing corpus as it lands. Structured Streaming cannot run
the blocked cross-join + ranking window directly over an unbounded stream,
and it does not need to: ``foreachBatch`` hands every micro-batch to the
BATCH incremental-linkage plan (``plans/linkage.assign_to_anchors``), so
the streaming path reuses — not reimplements — the scored assignment, and
each batch costs |delta| x avg-block-size comparisons.

Scale shape: identical to the batch delta plan per micro-batch; the base
corpus frame is constructed once and reused across batches (at cluster
scale: a bucketed table on the blocking key, so the per-batch join
co-locates — see ``sources/sinks.write_bucketed_table``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["streaming_assign_to_anchors"]


def streaming_assign_to_anchors(
    new_stream: DataFrame,
    base_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    schema=None,
    threshold: float | None = None,
    trigger_once: bool = False,
):
    """Start a streaming query that assigns every micro-batch of
    ``new_stream`` to anchors in ``base_df`` and appends the assignments
    (``record_id, anchor_id, best_score, is_new`` + ``batch_id``) to
    parquet at ``out_path``. Returns the StreamingQuery.

    Exactly-once to the sink: foreachBatch + parquet append keyed by the
    checkpoint; a replayed batch overwrites its own ``batch_id`` partition.
    """
    from pyspark.sql import functions as F

    from name_matching_spark.plans.linkage import assign_to_anchors

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        out = assign_to_anchors(
            batch_df, base_df, schema=schema, threshold=threshold
        ).withColumn("batch_id", F.lit(batch_id))
        (
            out.write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_path)
        )

    writer = (
        new_stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
