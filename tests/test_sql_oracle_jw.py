"""The pure-SQL DuckDB Jaro-Winkler (oracle_sql/jw.py) is bit-identical to
the scalar oracle (core/similarity.py) — and therefore to the numpy kernel,
which is property-tested against the same oracle in test_kernels.py."""

import duckdb
from hypothesis import given, settings, strategies as st

from name_matching_spark.core.similarity import jaro_winkler_similarity
from name_matching_spark.oracle_sql.jw import jw_cte_sql

ALPHABET = "abcdefghijklmnopqrstuvwxyz '_-019"
strings = st.text(alphabet=ALPHABET, max_size=24)


def sql_jw(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE sp(s1 VARCHAR, s2 VARCHAR)")
    con.executemany("INSERT INTO sp VALUES (?, ?)", pairs)
    q = "WITH " + jw_cte_sql("sp") + " SELECT s1, s2, jw FROM jw"
    return {(r[0], r[1]): r[2] for r in con.execute(q).fetchall()}


def test_golden_values():
    got = sql_jw([("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("", ""),
                  ("", "x"), ("ca", "abc")])
    assert abs(got[("MARTHA", "MARHTA")] - 0.9611111111111111) < 1e-15
    assert abs(got[("DIXON", "DICKSONX")] - 0.8133333333333332) < 1e-15
    assert got[("", "")] == 1.0
    assert got[("", "x")] == 0.0


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(strings, strings), min_size=1, max_size=60, unique=True))
def test_sql_jw_equals_scalar_oracle_bitexact(pairs):
    got = sql_jw(pairs)
    assert len(got) == len(pairs)
    for s1, s2 in pairs:
        want = jaro_winkler_similarity(s1, s2)
        assert got[(s1, s2)] == want, (s1, s2, got[(s1, s2)], want)


def sql_dl(pairs):
    from name_matching_spark.oracle_sql.dl import dl_cte_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE dp(s1 VARCHAR, s2 VARCHAR)")
    con.executemany("INSERT INTO dp VALUES (?, ?)", pairs)
    q = "WITH " + dl_cte_sql("dp") + " SELECT s1, s2, dist FROM dl"
    return {(r[0], r[1]): r[2] for r in con.execute(q).fetchall()}


def test_dl_golden_values():
    got = sql_dl([("ca", "abc"), ("ab", "ba"), ("", ""), ("", "xy"),
                  ("banana", "ananab"), ("abc", "abc")])
    assert got[("ca", "abc")] == 2  # full DL, not OSA (tests/test_matcher.py:61)
    assert got[("ab", "ba")] == 1
    assert got[("", "")] == 0
    assert got[("", "xy")] == 2
    assert got[("abc", "abc")] == 0


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abcde' -", max_size=12),
                          st.text(alphabet="abcde' -", max_size=12)),
                min_size=1, max_size=40, unique=True))
def test_sql_dl_equals_scalar_oracle(pairs):
    from name_matching_spark.core.similarity import damerau_levenshtein_distance

    got = sql_dl(pairs)
    assert len(got) == len(pairs)
    for s1, s2 in pairs:
        assert got[(s1, s2)] == damerau_levenshtein_distance(s1, s2), (s1, s2)


def sql_sw(pairs):
    from name_matching_spark.oracle_sql.sw import sw_cte_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE swp(s1 VARCHAR, s2 VARCHAR)")
    con.executemany("INSERT INTO swp VALUES (?, ?)", pairs)
    rows = con.execute(
        "WITH " + sw_cte_sql("swp") + " SELECT s1, s2, best FROM sw"
    ).fetchall()
    return {(r[0], r[1]): r[2] for r in rows}


def test_sw_golden_values():
    got = sql_sw([("abc", "abc"), ("abc", "xabcx"), ("abc", "xyz"),
                  ("martha", "marhta"), ("", ""), ("", "xy"),
                  ("kitten", "sitting")])
    assert got[("abc", "abc")] == 6      # full match: 2 * len
    assert got[("abc", "xabcx")] == 6    # contiguous containment
    assert got[("abc", "xyz")] == 0      # nothing local aligns
    assert got[("martha", "marhta")] == 8
    assert got[("", "")] == 0 and got[("", "xy")] == 0
    assert got[("kitten", "sitting")] == 7


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abcde' -", max_size=12),
                          st.text(alphabet="abcde' -", max_size=12)),
                min_size=1, max_size=40, unique=True))
def test_sql_sw_equals_scalar_oracle(pairs):
    from name_matching_spark.core.similarity import smith_waterman_score

    got = sql_sw(pairs)
    assert len(got) == len(pairs)
    for s1, s2 in pairs:
        assert got[(s1, s2)] == smith_waterman_score(s1, s2), (s1, s2)
