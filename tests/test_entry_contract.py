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


def test_time_queries_session_tz_invariant(spark):
    """The driver's session TZ is not guaranteed UTC: every time-emitting
    query must produce identical values under any session zone (epoch
    emission via NTZ wall-clock arithmetic, not cast-through-session-TZ)."""
    import __spark_entry__ as e

    qs = e.queries()
    names = [
        "q08_event_windows", "q37_sliding_windows", "q38_session_windows",
        "q47_asof_join", "q48_interval_join", "q52_funnel",
    ]
    tz_key = "spark.sql.session.timeZone"
    orig = spark.conf.get(tz_key)
    try:
        results = {}
        for tz in ("UTC", "America/New_York", "Asia/Kolkata"):
            spark.conf.set(tz_key, tz)
            for name in names:
                rows = frozenset(
                    tuple(r) for r in qs[name](spark, "/root/testdata/sf0.001").collect()
                )
                results.setdefault(name, {})[tz] = rows
    finally:
        spark.conf.set(tz_key, orig)
    for name, by_tz in results.items():
        vals = list(by_tz.values())
        assert vals[0] == vals[1] == vals[2], f"{name} varies with session TZ"
