"""Ingest: CSV column mapping + validation split + sinks."""

import pytest

from name_matching_spark.sources.readers import (
    IngestSpec,
    read_csv_mapped,
    validate_records,
)
from name_matching_spark.sources.sinks import write_match_results


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "Name,Surname,DOB\n"
        "Juan,Cruz Santos,1990-01-01\n"
        "Maria,Reyes Garcia,05/15/1985\n"
        ",Empty First,1990-01-01\n"
        "Pedro,Dela Cruz,not-a-date\n"
    )
    return str(p)


def test_read_mapped_and_validate(spark, csv_path):
    spec = IngestSpec(
        column_mapping={
            "Name": "first_name",
            "Surname": "middle_name_last_name",
            "DOB": "birthdate",
        }
    )
    df = read_csv_mapped(spark, csv_path, spec)
    assert {"first_name", "middle_name_last_name", "birthdate"} <= set(df.columns)

    valid, invalid = validate_records(df)
    assert valid.count() == 2
    bad = {r["first_name"]: r["_violations"] for r in invalid.collect()}
    assert bad[None] == ["first_name"]
    assert bad["Pedro"] == ["birthdate"]


def test_missing_required_raises(spark, csv_path):
    with pytest.raises(ValueError, match="missing required"):
        read_csv_mapped(spark, csv_path, IngestSpec(column_mapping={}))


def test_write_match_results_dedups(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "b", 0.9), ("a", "b", 0.9), ("a", "c", 0.8)],
        ["id1", "id2", "score"],
    )
    out = str(tmp_path / "matches")
    write_match_results(df, out, mode="overwrite")
    back = spark.read.parquet(out)
    assert back.count() == 2


def test_catalog_introspection(spark):
    """S10: stock spark.catalog covers the reference's information_schema
    queries (db/table/column listing) — pin the surface we claim."""
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    df.createOrReplaceTempView("s10_probe")
    try:
        tables = {t.name for t in spark.catalog.listTables()}
        assert "s10_probe" in tables
        cols = {c.name: c.dataType for c in spark.catalog.listColumns("s10_probe")}
        assert cols == {"id": "bigint", "name": "string"}
        assert spark.catalog.tableExists("s10_probe")
    finally:
        spark.catalog.dropTempView("s10_probe")
    assert not spark.catalog.tableExists("s10_probe")


def test_write_report_csv(spark, tmp_path):
    """S8: driver-sized CSV report with the row cap enforced."""
    import pandas as pd

    from name_matching_spark.sources.sinks import write_report_csv

    df = spark.range(10).selectExpr("id", "id * 2 AS double_id")
    out = tmp_path / "report.csv"
    write_report_csv(df.orderBy("id"), str(out), max_rows=5)
    back = pd.read_csv(out)
    assert list(back.columns) == ["id", "double_id"]
    assert len(back) == 5
    assert back["double_id"].tolist() == [0, 2, 4, 6, 8]


def test_read_jsonl_mapped_remap_and_corrupt(spark, tmp_path):
    from name_matching_spark.sources.readers import IngestSpec, read_jsonl_mapped

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"Name": "Juan", "Surname": "Santos", "birthdate": "1990-01-02"}\n'
        "THIS IS NOT JSON\n"
        '{"Name": "Maria", "Surname": "Cruz", "birthdate": "bad-date"}\n'
    )
    spec = IngestSpec(
        column_mapping={"Name": "first_name", "Surname": "middle_name_last_name"}
    )
    df = read_jsonl_mapped(
        spark,
        str(p),
        spec,
        schema="Name STRING, Surname STRING, birthdate STRING",
    )
    rows = df.collect()
    assert len(rows) == 3
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == 1 and "NOT JSON" in corrupt[0]._corrupt_record

    from name_matching_spark.sources.readers import validate_records

    ok, bad = validate_records(df.filter("_corrupt_record IS NULL"))
    assert [r.first_name for r in ok.collect()] == ["Juan"]
    assert [r._violations for r in bad.collect()] == [["birthdate"]]


def test_read_jsonl_mapped_missing_required_raises(spark, tmp_path):
    import pytest as _pt

    from name_matching_spark.sources.readers import read_jsonl_mapped

    p = tmp_path / "in2.jsonl"
    p.write_text('{"Name": "Juan"}\n')
    with _pt.raises(ValueError, match="missing required"):
        read_jsonl_mapped(spark, str(p), schema="Name STRING")
