"""asof_join vs pandas merge_asof + hand-pinned edge cases."""

from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from name_matching_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:05"), 100.0),
            (1, _ts("2024-01-01T10:00:20"), 101.0),
            (2, _ts("2024-01-01T10:00:10"), 50.0),
            (3, _ts("2024-01-01T10:00:10"), 7.0),  # key with no quotes
        ],
        "sym long, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:01"), 99.5, 10),
            (1, _ts("2024-01-01T10:00:05"), 99.9, 11),  # equal-ts: included backward
            (1, _ts("2024-01-01T10:00:19"), 100.5, 12),
            (2, _ts("2024-01-01T10:00:30"), 49.0, 13),  # only AFTER the trade
        ],
        "sym long, ts timestamp, bid double, qid integer",
    )
    return trades, quotes


def test_asof_backward_semantics(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {
        (r["sym"], r["ts"]): (r["qid_right"], r["bid_right"])
        for r in asof_join(trades, quotes, on="ts", by=["sym"]).collect()
    }
    assert out[(1, _ts("2024-01-01T10:00:05"))] == (11, 99.9)  # equal ts matches
    assert out[(1, _ts("2024-01-01T10:00:20"))] == (12, 100.5)
    assert out[(2, _ts("2024-01-01T10:00:10"))] == (None, None)  # quote is later
    assert out[(3, _ts("2024-01-01T10:00:10"))] == (None, None)  # no quotes at all


def test_asof_forward_and_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    fwd = {
        (r["sym"], r["ts"]): r["qid_right"]
        for r in asof_join(trades, quotes, on="ts", by=["sym"], direction="forward").collect()
    }
    assert fwd[(1, _ts("2024-01-01T10:00:05"))] == 11  # equal ts matches forward too
    assert fwd[(2, _ts("2024-01-01T10:00:10"))] == 13  # the later quote
    assert fwd[(1, _ts("2024-01-01T10:00:20"))] is None  # nothing after

    tol = {
        (r["sym"], r["ts"]): r["qid_right"]
        for r in asof_join(
            trades, quotes, on="ts", by=["sym"],
            tolerance=F.expr("INTERVAL 1 SECOND"),
        ).collect()
    }
    assert tol[(1, _ts("2024-01-01T10:00:05"))] == 11  # gap 0 <= 1s
    assert tol[(1, _ts("2024-01-01T10:00:20"))] == 12  # gap 1s, boundary inclusive
    assert tol[(2, _ts("2024-01-01T10:00:10"))] is None


def test_asof_tie_break_picks_max(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:10"))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:05"), 7),
            (1, _ts("2024-01-01T10:00:05"), 9),  # same ts: max rid wins
            (1, _ts("2024-01-01T10:00:05"), 8),
        ],
        "k long, ts timestamp, rid integer",
    )
    out = asof_join(left, right, on="ts", by=["k"], tie_break="rid").collect()
    assert out[0]["rid_right"] == 9


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized comparison against pandas merge_asof on tie-free data."""
    import numpy as np

    rng = np.random.default_rng(11)
    lt = sorted(rng.choice(10_000, size=200, replace=False).tolist())
    rt = sorted(rng.choice(10_000, size=150, replace=False).tolist())
    lpdf = pd.DataFrame(
        {"k": [int(x) % 3 for x in lt], "ts": pd.to_datetime(lt, unit="s"), "lv": lt}
    )
    rpdf = pd.DataFrame(
        {"k": [int(x) % 3 for x in rt], "ts": pd.to_datetime(rt, unit="s"), "rv": rt}
    )
    want = pd.merge_asof(
        lpdf.sort_values("ts"), rpdf.sort_values("ts"), on="ts", by="k"
    )
    got = asof_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), on="ts", by=["k"]
    ).toPandas()
    wmap = {(r.k, r.ts): None if pd.isna(r.rv) else int(r.rv) for r in want.itertuples()}
    gmap = {
        (r.k, r.ts): None if pd.isna(r.rv_right) else int(r.rv_right)
        for r in got.itertuples()
    }
    assert gmap == wmap


def test_asof_rejects_bad_args(spark, trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="ts", by=["sym"], direction="sideways")
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="ts", by=["sym"], tie_break="nope")


def test_interval_join_containment(spark):
    from name_matching_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),  # == start: included
            (1, _ts("2024-01-01T10:29:59"), 101),  # inside
            (1, _ts("2024-01-01T10:30:00"), 102),  # == end: excluded
            (1, _ts("2024-01-01T12:00:00"), 103),  # outside
            (2, _ts("2024-01-01T10:10:00"), 104),  # other key: no interval
        ],
        "k long, ts timestamp, pid integer",
    )
    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T10:30:00"), 7),
            # overlapping second interval catches pid 101 too
            (1, _ts("2024-01-01T10:15:00"), _ts("2024-01-01T11:00:00"), 8),
            # empty interval: never matches
            (1, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T10:00:00"), 9),
        ],
        "k long, s timestamp, e timestamp, iid integer",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, on="ts", start_col="s", end_col="e",
            by=["k"], grain_seconds=600,
        ).collect()
    }
    # 102 is == end of interval 7 (excluded) but inside interval 8
    assert got == {(100, 7), (101, 7), (101, 8), (102, 8)}
    # grain choice cannot change results — only the plan
    for grain in (1, 37, 86_400):
        g2 = {
            (r["pid"], r["iid"])
            for r in interval_join(
                points, intervals, on="ts", start_col="s", end_col="e",
                by=["k"], grain_seconds=grain,
            ).collect()
        }
        assert g2 == got, grain
    with pytest.raises(ValueError):
        interval_join(points, points, on="ts", start_col="s", end_col="e", by=["k"])
