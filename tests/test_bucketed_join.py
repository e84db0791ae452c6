"""Bucketed-table co-location: the recurring-join layout for 100 TB runs.

Two tables bucketed identically on the join key must equi-join with ZERO
shuffle exchange — the physical plan reads the bucket layout directly.
This is the plan-level proof of the scale story in
``sinks.write_bucketed_table``.
"""

import pytest
from pyspark.sql import functions as F

from name_matching_spark.sources.sinks import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    a = spark.range(0, 10_000).select(
        F.col("id").alias("record_id"), (F.col("id") % 97).alias("v1")
    )
    b = spark.range(0, 10_000, 2).select(
        F.col("id").alias("record_id"), (F.col("id") % 31).alias("v2")
    )
    write_bucketed_table(a, "nms_bucket_a", ["record_id"], 8, sort_cols=["record_id"])
    write_bucketed_table(b, "nms_bucket_b", ["record_id"], 8, sort_cols=["record_id"])
    yield spark.table("nms_bucket_a"), spark.table("nms_bucket_b")
    spark.sql("DROP TABLE IF EXISTS nms_bucket_a")
    spark.sql("DROP TABLE IF EXISTS nms_bucket_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    # disable auto-broadcast: the point is the layout for tables too big
    # to broadcast — with identical bucketing, sort-merge join reads both
    # sides in place (no Exchange of any kind in the plan)
    ta, tb = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "record_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_values_match_plain_join(spark, bucketed_pair):
    ta, tb = bucketed_pair
    got = {
        (r.record_id, r.v1, r.v2)
        for r in ta.join(tb, "record_id").collect()
    }
    want = {(i, i % 97, i % 31) for i in range(0, 10_000, 2)}
    assert got == want


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    # control: the same join WITHOUT bucket metadata exchanges both sides
    ta, _ = bucketed_pair
    plain = spark.range(0, 10_000, 2).select(
        F.col("id").alias("record_id"), (F.col("id") % 31).alias("v2")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            ta.join(plain, "record_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_sink_prunes_partitions(spark, tmp_path):
    """write_match_results(partition_by=...) + a filtered read must show
    the filter as a PartitionFilter on the scan (directory pruning — at
    100 TB the difference between reading one class and all of them)."""
    from pyspark.sql import functions as F

    from name_matching_spark.sources.sinks import write_match_results

    matches = spark.range(0, 1000).select(
        F.col("id").alias("id1"),
        (F.col("id") + 100000).alias("id2"),
        (F.col("id") % 100 / 100).alias("score"),
        F.when(F.col("id") % 3 == 0, "match")
        .otherwise("manual_review")
        .alias("classification"),
    )
    out = str(tmp_path / "matches")
    write_match_results(matches, out, mode="overwrite",
                        partition_by=["classification"])
    rd = spark.read.parquet(out).filter(F.col("classification") == "match")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate must be IN the partition filters, not a
    # post-scan data filter
    pf = plan[plan.index("PartitionFilters"):]
    assert "classification" in pf[:200], plan
    assert rd.count() == 334
