"""Stateful streaming: first-seen key detection across micro-batches."""

import datetime as dt

from name_matching_spark.streaming.stateful import first_seen_keys


def test_batch_form(spark):
    rows = [
        (dt.datetime(2024, 1, 1, 0, 10), "A"),
        (dt.datetime(2024, 1, 1, 0, 5), "A"),
        (dt.datetime(2024, 1, 1, 1, 0), "B"),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, block_key string")
    got = {r["key"]: (r["first_ts"], r["n_in_first_batch"]) for r in first_seen_keys(df).collect()}
    assert got["A"] == (dt.datetime(2024, 1, 1, 0, 5), 2)
    assert got["B"][1] == 1


def test_streaming_emits_keys_once(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    schema = "ts timestamp, block_key string"

    batch1 = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 10), "A"), (dt.datetime(2024, 1, 1, 0, 20), "B")],
        schema,
    )
    batch1.write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(batch1.schema).parquet(str(src / "*"))
    q = (
        first_seen_keys(stream)
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r["key"] for r in spark.sql("select * from first_seen").collect()}
        assert first == {"A", "B"}

        # second micro-batch: A repeats (must NOT re-emit), C is new
        batch2 = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 2, 0), "A"), (dt.datetime(2024, 1, 1, 2, 5), "C")],
            schema,
        )
        batch2.write.parquet(str(src / "b2"))
        q.processAllAvailable()
        rows = spark.sql("select * from first_seen").collect()
        keys = [r["key"] for r in rows]
        assert sorted(keys) == ["A", "B", "C"]  # A exactly once
    finally:
        q.stop()


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """Duplicate content arriving in a LATER micro-batch is suppressed by
    keyed state; batch mode gives the same first-occurrence semantics."""
    from name_matching_spark.streaming.dedup import streaming_exact_dedup

    src = tmp_path / "docs_src"
    src.mkdir()
    schema = "doc_id long, text string"
    b0 = spark.createDataFrame([(0, "alpha beta"), (1, "gamma")], schema)
    b0.write.parquet(str(src / "b0"))

    stream = spark.readStream.schema(b0.schema).parquet(str(src / "*"))
    out = streaming_exact_dedup(stream)
    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one dup of doc 0's content, one new doc
        b1 = spark.createDataFrame([(2, "alpha beta"), (3, "delta")], schema)
        b1.write.parquet(str(src / "b1"))
        q.processAllAvailable()
        rows = spark.sql("select * from dedup_out").collect()
        texts = sorted(r["text"] for r in rows)
        assert texts == ["alpha beta", "delta", "gamma"]  # dup dropped
        assert all(r["content_hash"] for r in rows)
    finally:
        q.stop()

    # batch form: same distinct-content keeper behavior
    batch = spark.createDataFrame(
        [(0, "alpha beta"), (2, "alpha beta"), (1, "gamma")], schema
    )
    got = streaming_exact_dedup(batch).collect()
    assert sorted(r["doc_id"] for r in got) == [0, 1]


# ---------------------------------------------------------------------------
# Streaming incremental linkage (foreachBatch -> assign_to_anchors)
# ---------------------------------------------------------------------------


def test_streaming_assign_to_anchors(spark, tmp_path):
    from name_matching_spark.operators.normalize import LinkageSchema
    from name_matching_spark.streaming.linkage import streaming_assign_to_anchors

    cols = [
        "record_id", "first_name", "middle_name_last_name",
        "birthdate", "province_name", "city_name",
    ]
    base = spark.createDataFrame(
        [
            ("b1", "Juan", "Reyes Santos", "1990-01-02", "Cebu", "Cebu City"),
            ("b2", "Maria", "Cruz", "1985-03-04", "Leyte", "Tacloban"),
        ],
        cols,
    )
    src = tmp_path / "src"
    src.mkdir()
    d1 = spark.createDataFrame(
        [("n1", "Juan", "Reyes Santos", "1990-01-02", "Cebu", "Cebu City")], cols
    )
    d2 = spark.createDataFrame(
        [("n2", "Zebulon", "Qwerty Zzyzx", "1900-01-01", "Nowhere", "Nowhere City")],
        cols,
    )
    d1.write.parquet(str(src / "b1"))
    d2.write.parquet(str(src / "b2"))

    stream = spark.readStream.schema(base.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    out_path = str(tmp_path / "out")
    q = streaming_assign_to_anchors(
        stream,
        base,
        out_path,
        str(tmp_path / "ckpt"),
        schema=LinkageSchema(id_col="record_id"),
        trigger_once=True,
    )
    q.awaitTermination(240)

    got = {r.record_id: r for r in spark.read.parquet(out_path).collect()}
    assert set(got) == {"n1", "n2"}
    assert got["n1"].anchor_id == "b1" and got["n1"].is_new == 0
    assert got["n1"].best_score == 1.0
    assert (got["n2"].anchor_id, got["n2"].is_new) == ("-1", 1)


def test_streaming_near_dedup_across_batches(spark, tmp_path):
    """LSH near-duplicate suppression across micro-batches: batch-internal
    dup detected, cross-batch dup rejected via the persisted signature
    store, genuinely new content kept and added to the store."""
    from name_matching_spark.operators.dedup import minhash_lsh_pairs
    from name_matching_spark.streaming.dedup import streaming_near_dedup

    base = "the quick brown fox jumps over the lazy dog again and again " * 6
    dup_a = base.replace("lazy dog", "lazy cat", 1)
    dup_b = base.replace("quick brown", "swift brown", 1)
    other = "entirely unrelated corpus material about spark shuffles " * 6

    # precondition (keeps the test honest if the texts change): the batch
    # LSH at this config must see 1~2, 1~3 as candidates and not 1~4
    allb = spark.createDataFrame(
        [(1, base), (2, dup_a), (3, dup_b), (4, other)], "doc_id long, text string"
    )
    cand = {
        (r.id1, r.id2)
        for r in minhash_lsh_pairs(allb, num_hashes=16, bands=4).collect()
    }
    assert (1, 2) in cand and (1, 3) in cand
    assert all(4 not in p for p in cand)

    src = tmp_path / "docs"
    src.mkdir()
    # coalesce(1): one part file per logical batch — maxFilesPerTrigger
    # batches at PART-file granularity, so a multi-part write would split
    # (1, 2) across micro-batches and scramble the arrival order
    spark.createDataFrame(
        [(1, base), (2, dup_a)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(
        [(3, dup_b), (4, other)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b2"))

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    out_path = str(tmp_path / "verdicts")
    store_path = str(tmp_path / "store")
    q = streaming_near_dedup(
        stream, out_path, store_path, str(tmp_path / "ckpt"),
        num_hashes=16, bands=4, trigger_once=True,
    )
    q.awaitTermination(240)

    got = {r.doc_id: r for r in spark.read.parquet(out_path).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1].is_dup == 0 and got[1].dup_of is None
    assert got[2].is_dup == 1 and got[2].dup_of == 1   # batch-internal
    assert got[3].is_dup == 1 and got[3].dup_of == 1   # via the store
    assert got[4].is_dup == 0
    # only keepers' signatures persist
    keepers = {r.doc_id for r in spark.read.parquet(store_path).collect()}
    assert keepers == {1, 4}


def test_near_dedup_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch (failure between the store write and the
    checkpoint commit) must reproduce IDENTICAL verdicts and store rows:
    the store read excludes the replayed batch's own partition, so kept
    docs never match their own signatures (r4 advice item)."""
    from name_matching_spark.streaming.dedup import near_dedup_apply_batch

    base = "the quick brown fox jumps over the lazy dog again and again " * 6
    dup_a = base.replace("lazy dog", "lazy cat", 1)
    dup_b = base.replace("quick brown", "swift brown", 1)
    other = "entirely unrelated corpus material about spark shuffles " * 6

    out_path = str(tmp_path / "verdicts")
    store_path = str(tmp_path / "store")
    b0 = spark.createDataFrame(
        [(1, base), (2, dup_a)], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(3, dup_b), (4, other)], "doc_id long, text string"
    )
    for bid, df in ((0, b0), (1, b1)):
        near_dedup_apply_batch(
            df, bid, out_path, store_path, num_hashes=16, bands=4
        )

    def _snap(path):
        return sorted(
            tuple(r) for r in spark.read.parquet(path).collect()
        )

    verdicts1, store1 = _snap(out_path), _snap(store_path)
    # replay BOTH batches (same batch_id, same input) — the failure-replay
    # scenario; verdicts and store must be byte-identical, not corrupted
    # by self-matches against the batch's own earlier store partition
    for bid, df in ((1, b1), (0, b0)):
        near_dedup_apply_batch(
            df, bid, out_path, store_path, num_hashes=16, bands=4
        )
    assert _snap(out_path) == verdicts1
    assert _snap(store_path) == store1
    got = {r.doc_id: r for r in spark.read.parquet(out_path).collect()}
    assert got[3].is_dup == 1 and got[3].dup_of == 1
    assert got[1].is_dup == 0 and got[4].is_dup == 0


def test_near_dedup_step_string_ids(spark):
    """First-batch dup_of null literal must carry the id column's TYPE —
    string doc ids coalesce against the batch-hit column (r4 advice)."""
    from name_matching_spark.streaming.dedup import near_dedup_batch_step

    base = "the quick brown fox jumps over the lazy dog again and again " * 6
    dup = base.replace("lazy dog", "lazy cat", 1)
    batch = spark.createDataFrame(
        [("a", base), ("b", dup)], "doc_id string, text string"
    )
    verdict, new_sigs = near_dedup_batch_step(
        batch, None, num_hashes=16, bands=4
    )
    got = {r.doc_id: r for r in verdict.collect()}
    assert got["a"].is_dup == 0 and got["a"].dup_of is None
    assert got["b"].is_dup == 1 and got["b"].dup_of == "a"
    assert {r.doc_id for r in new_sigs.select("doc_id").distinct().collect()} == {"a"}
