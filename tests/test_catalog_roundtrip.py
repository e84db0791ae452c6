"""Catalog-table round trip for the real write path (r4 verdict item 6).

``sources.sinks.write_match_results`` has two branches: a parquet path and
a catalog table (``writeTo(...).append()`` — the Iceberg shape when the
session catalog is Iceberg; this sandbox has no Iceberg runtime jar, so
the built-in session catalog stands in: same DataFrameWriterV2 API, same
catalog resolution, file-backed warehouse). These tests cover:

* creating/reading an ACTUAL catalog table through the sink (append mode,
  pair-uniqueness enforced across appends' input),
* warehouse files surviving a catalog drop and being re-registered
  (``CREATE TABLE ... USING parquet LOCATION``) — the simulated-restart
  equivalent for a file-backed catalog, where a new session's catalog is
  empty but the warehouse persists,
* snapshot-per-range commits of ``CheckpointedLinkage``: each range is an
  independent atomic unit (results dir + manifest written LAST), and a
  restart with a fresh runner instance resumes via the manifest anti-join
  without recomputing completed ranges.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from name_matching_spark.operators.normalize import LinkageSchema
from name_matching_spark.plans.checkpoint import CheckpointedLinkage
from name_matching_spark.sources.sinks import write_match_results
from name_matching_spark.datagen import person_records

SCHEMA = LinkageSchema(id_col="record_id")


@pytest.fixture
def matches_df(spark):
    return spark.createDataFrame(
        [(1, 2, 0.97), (1, 3, 0.81), (1, 2, 0.97)],  # (1,2) duplicated
        "id1 long, id2 long, score double",
    )


def test_write_match_results_catalog_table(spark, matches_df):
    import shutil

    spark.sql("DROP TABLE IF EXISTS nms_matches_rt")
    # an earlier crashed run may have dropped the catalog entry but left
    # the managed location behind (the warehouse outlives the in-memory
    # catalog — the exact persistence these tests lean on)
    shutil.rmtree("/tmp/nms-warehouse/nms_matches_rt", ignore_errors=True)
    # table must exist for a V2 append — create empty with the same schema
    matches_df.limit(0).write.saveAsTable("nms_matches_rt")
    write_match_results(matches_df, "nms_matches_rt")

    got = spark.table("nms_matches_rt")
    rows = {(r.id1, r.id2, r.score) for r in got.collect()}
    # pair uniqueness enforced on the appended input
    assert rows == {(1, 2, 0.97), (1, 3, 0.81)}

    # second append accumulates (the sink's contract is per-write input
    # dedup, global uniqueness belongs to the reader/MERGE layer)
    write_match_results(
        spark.createDataFrame([(4, 5, 0.6)], "id1 long, id2 long, score double"),
        "nms_matches_rt",
    )
    assert spark.table("nms_matches_rt").count() == 3
    spark.sql("DROP TABLE IF EXISTS nms_matches_rt")


def test_catalog_reregistration_survives_drop(spark, matches_df, tmp_path):
    """Simulated restart for a file-backed catalog: the data location
    outlives the catalog entry; re-registering the location recovers the
    table byte-for-byte."""
    loc = str(tmp_path / "matches_tbl")
    write_match_results(matches_df, loc)  # path branch: plain parquet
    spark.sql("DROP TABLE IF EXISTS nms_matches_ext")
    spark.sql(f"CREATE TABLE nms_matches_ext USING parquet LOCATION '{loc}'")
    before = {(r.id1, r.id2, r.score) for r in spark.table("nms_matches_ext").collect()}
    assert before == {(1, 2, 0.97), (1, 3, 0.81)}

    # "restart": catalog forgets the table; files persist; re-register
    spark.sql("DROP TABLE nms_matches_ext")
    spark.sql(f"CREATE TABLE nms_matches_ext USING parquet LOCATION '{loc}'")
    after = {(r.id1, r.id2, r.score) for r in spark.table("nms_matches_ext").collect()}
    assert after == before
    spark.sql("DROP TABLE IF EXISTS nms_matches_ext")


def test_checkpoint_snapshot_per_range_and_restart_resume(spark, tmp_path):
    """Every completed range = one results snapshot + one manifest whose
    counters match the snapshot; a crash mid-run loses only unfinished
    ranges, and a FRESH runner (simulated restart) resumes exactly the
    missing set via the manifest anti-join."""
    recs = person_records(n_entities=40, dup_rate=0.5, seed=77)
    df = spark.createDataFrame(recs.drop(columns=["entity_id"]))
    out = str(tmp_path / "ckpt_restart")

    runner = CheckpointedLinkage(out, num_ranges=4, schema=SCHEMA)

    # crash after two ranges: wrap _run_range to raise on the 3rd call
    orig = CheckpointedLinkage._run_range
    calls = {"n": 0}

    def crashing(self, *a, **kw):
        if calls["n"] >= 2:
            raise RuntimeError("simulated executor loss")
        calls["n"] += 1
        return orig(self, *a, **kw)

    CheckpointedLinkage._run_range = crashing
    try:
        with pytest.raises(RuntimeError, match="simulated executor loss"):
            runner.run(df)
    finally:
        CheckpointedLinkage._run_range = orig

    done = runner.completed_ranges()
    assert len(done) == 2
    # snapshot-per-range: each completed range has its own results dir and
    # a manifest whose counters equal the snapshot's actual row count
    for i in done:
        snap = os.path.join(out, "matches", f"range={i}")
        with open(os.path.join(out, "_manifest", f"range_{i}.json")) as f:
            m = json.load(f)
        assert m["status"] == "complete"
        assert spark.read.parquet(snap).count() == m["counters"]["rows_written"]
    # incomplete ranges left NO manifest (written last)
    assert not {0, 1, 2, 3} - done - {
        i for i in range(4)
        if not os.path.exists(os.path.join(out, "_manifest", f"range_{i}.json"))
    }

    # restart: a brand-new runner instance sees the manifests and executes
    # ONLY the missing ranges
    fresh = CheckpointedLinkage(out, num_ranges=4, schema=SCHEMA)
    executed = fresh.run(df)
    assert sorted(executed) == sorted(set(range(4)) - done)

    # the union equals a never-crashed run in a separate directory
    clean_dir = str(tmp_path / "ckpt_clean")
    clean = CheckpointedLinkage(clean_dir, num_ranges=4, schema=SCHEMA)
    clean.run(df)
    a = {
        (r.id1, r.id2, round(r.score, 9))
        for r in fresh.results(spark).select("id1", "id2", "score").collect()
    }
    b = {
        (r.id1, r.id2, round(r.score, 9))
        for r in clean.results(spark).select("id1", "id2", "score").collect()
    }
    assert a == b and a
