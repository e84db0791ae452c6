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
