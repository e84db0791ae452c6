"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are aligned."""

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"id1", "id2", "score", "classification"} <= set(df.columns)
    assert len(rows) > 0  # the sf0.001 person table has real duplicates


def test_every_oracle_has_query():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, name


def test_queries_run_at_smallest_sf(spark):
    sf = "/root/testdata/sf0.001"
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf)
        assert df.count() >= 0, name
