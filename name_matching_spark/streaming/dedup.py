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

__all__ = [
    "streaming_exact_dedup",
    "streaming_near_dedup",
    "near_dedup_batch_step",
    "near_dedup_apply_batch",
    "near_dedup_replay",
]


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


def streaming_near_dedup(
    doc_stream: DataFrame,
    out_path: str,
    store_path: str,
    checkpoint_dir: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_once: bool = False,
):
    """Streaming NEAR-duplicate suppression: each micro-batch of documents
    is LSH-banded (MinHash, same math as the batch
    ``operators.dedup.minhash_lsh_pairs``) against a persisted signature
    store of everything accepted so far, plus against itself.

    A new document is a duplicate iff it shares at least one full band
    signature with an accepted document (the standard banding decision —
    candidate probability at Jaccard j is 1-(1-j^r)^b) or with an earlier
    (lower-id) unique document of the same batch. Kept documents append
    their band signatures to the store; ``dup_of`` names the smallest
    matching keeper.

    Exactly-once: ``foreachBatch`` + dynamic ``batch_id`` partition
    overwrite for BOTH the verdict sink and the signature store, so a
    replayed batch rewrites its own partitions instead of double-counting.
    Scale shape: the per-batch work is |batch signatures| joined against
    the store on (band, band_sig) — an equi-join on the LSH key, never
    all-pairs; the store grows O(accepted docs x bands) and at cluster
    scale lives as a table bucketed by (band, band_sig).
    """
    spark = doc_stream.sparkSession

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        near_dedup_apply_batch(
            batch_df,
            batch_id,
            out_path,
            store_path,
            num_hashes=num_hashes,
            bands=bands,
            shingle_len=shingle_len,
            text_col=text_col,
            id_col=id_col,
            spark=spark,
        )

    writer = (
        doc_stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def near_dedup_batch_step(
    batch_df: DataFrame,
    store: DataFrame | None,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of the near-dup suppression, as a pure batch
    transform: given the batch documents and the accepted-signature store
    from PRIOR batches (``(id_col, band, band_sig)`` rows, or ``None`` on
    the first batch), return ``(verdict, new_sigs)``.

    ``verdict`` is ``(id_col, dup_of, is_dup)``: ``dup_of`` is the
    smallest store keeper sharing a band signature, else the smallest
    lower-id same-batch doc sharing one, else NULL (kept). ``new_sigs``
    are the kept docs' band signatures — the store contribution of this
    batch. Shared verbatim by the streaming ``foreachBatch`` handler and
    the batch-replay audit (``near_dedup_replay``), so the persisted-store
    semantics tested against the SQL oracle are the ones deployed
    streaming.
    """
    from name_matching_spark.operators.dedup import minhash_band_signatures

    id_type = batch_df.schema[id_col].dataType
    sigs = minhash_band_signatures(
        batch_df, num_hashes, bands, shingle_len, text_col, id_col
    ).localCheckpoint()
    hits_store = None
    if store is not None:
        hits_store = (
            sigs.join(
                store.select(F.col(id_col).alias("_keeper"), "band", "band_sig"),
                ["band", "band_sig"],
            )
            .groupBy(id_col)
            .agg(F.min("_keeper").alias("dup_of"))
        )
    # vs earlier (lower-id) docs of the SAME batch
    a = sigs.select(F.col(id_col).alias("_new"), "band", "band_sig")
    b = sigs.select(F.col(id_col).alias("_old"), "band", "band_sig")
    hits_batch = (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("_old") < F.col("_new"))
        .groupBy(F.col("_new").alias(id_col))
        .agg(F.min("_old").alias("dup_of_batch"))
    )
    verdict = batch_df.select(id_col).join(hits_batch, id_col, "left")
    if hits_store is not None:
        verdict = verdict.join(hits_store, id_col, "left")
    else:
        # the null literal must carry the id column's type — a hardcoded
        # long would fail (or miscast) the coalesce for string doc ids
        verdict = verdict.withColumn("dup_of", F.lit(None).cast(id_type))
    # dup_of may point at another duplicate (doc C dups doc B which
    # dups keeper A through a different band): suppression is still
    # correct — C is near-duplicate transitively — and the verdict log
    # forms a union-find-style chain to the keeper; consumers wanting
    # the root keeper follow the chain (or run the batch
    # dedup_clusters plan over the log)
    verdict = verdict.select(
        id_col,
        F.coalesce("dup_of", "dup_of_batch").alias("dup_of"),
    ).withColumn("is_dup", F.col("dup_of").isNotNull().cast("int"))
    kept = verdict.filter(F.col("is_dup") == 0).select(id_col)
    new_sigs = sigs.join(kept, id_col)
    return verdict, new_sigs


def near_dedup_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_path: str,
    store_path: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    spark=None,
) -> None:
    """Apply :func:`near_dedup_batch_step` with the PERSISTED parquet
    store: read prior-batch signatures, write this batch's verdict and
    store partitions via dynamic ``batch_id`` partition overwrite
    (exactly-once under replay).

    The store read is filtered to ``batch_id < batch_id`` — a REPLAYED
    batch (failure between the store write and the checkpoint commit)
    must not see its own earlier store partition, or every previously
    kept doc would match its own signatures, flip to is_dup=1 with
    dup_of=itself, and the overwrite would then erase the batch's keeper
    signatures for good. Filtering to prior batches makes replay
    idempotent: same input partition -> same verdicts -> same store rows.
    """
    if spark is None:
        spark = batch_df.sparkSession
    if not batch_df.take(1):
        return
    try:
        store = (
            spark.read.parquet(store_path)
            .filter(F.col("batch_id") < batch_id)
            .select(id_col, "band", "band_sig")
        )
    except Exception:  # first batch: no store yet
        store = None
    verdict, new_sigs = near_dedup_batch_step(
        batch_df,
        store,
        num_hashes=num_hashes,
        bands=bands,
        shingle_len=shingle_len,
        text_col=text_col,
        id_col=id_col,
    )
    (
        verdict.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(out_path)
    )
    (
        new_sigs.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(store_path)
    )


def near_dedup_replay(
    docs: DataFrame,
    batch_col: str,
    out_path: str,
    store_path: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch-replay of the streaming near-dup suppression: process the
    ``batch_col`` partitions of ``docs`` in ascending order through the
    SAME persisted-store step the ``foreachBatch`` handler runs
    (:func:`near_dedup_apply_batch`), then return the full verdict log
    ``(id_col, dup_of, is_dup, batch_id)``.

    This is the driver-visible correctness surface for the streaming
    path: a deterministic batch key makes the whole run (banding, store
    evolution, keeper choice) reproducible in ANSI SQL, so the persisted-
    signature semantics get a value-hash oracle rather than only a pytest.
    The batch-id collect is a handful of ints — micro-batch sequencing is
    inherently driver-ordered, exactly like the streaming engine's own
    batch loop.
    """
    batch_ids = [
        r[0]
        for r in docs.select(batch_col).distinct().orderBy(batch_col).collect()
    ]
    for bid in batch_ids:
        near_dedup_apply_batch(
            docs.filter(F.col(batch_col) == bid).drop(batch_col),
            int(bid),
            out_path,
            store_path,
            num_hashes=num_hashes,
            bands=bands,
            shingle_len=shingle_len,
            text_col=text_col,
            id_col=id_col,
        )
    spark = docs.sparkSession
    return spark.read.parquet(out_path).select(
        id_col, "dup_of", "is_dup", F.col("batch_id").cast("int").alias("batch_id")
    )
