"""FULL Damerau-Levenshtein distance as PURE DuckDB SQL.

Companion to ``oracle_sql/jw.py``: renders the alphabet-indexed full-DL DP
(the jellyfish-compatible algorithm of ``kernels._dl_distance_chunk`` /
``core.similarity.damerau_levenshtein_distance``; reference primary path
``/root/reference/src/matcher.py:245``, pinned by dist("ca","abc")=2) as a
recursive CTE so Monge-Elkan-DL gets a driver-exact oracle.

Shape: the textbook (L1+2) x (L2+2) matrix is carried through the
recursion as a LIST(LIST(INT)) — one recursion step appends one DP row.
The within-row left-neighbor dependency ``d[i][j] = min(t[j], d[i][j-1]+1)``
is eliminated with the classic min-plus prefix form::

    d[i][j] = least(j + min_{j'<=j}(t[j'] - j'),  i + j)

(t[j] = min of the diagonal/up/transposition candidates, none of which
depend on the current row), so each row is ONE list_transform. The
transposition indices k (last row < i with a[k] == b[j]) and l (last col
< j with b[l] == a[i]) are recomputed from the strings with list_filter —
O(L) per cell, irrelevant at name-token lengths.

Tested bit-equal to the scalar oracle by ``tests/test_sql_oracle_jw.py``.
"""

from __future__ import annotations

__all__ = ["dl_cte_sql"]


def dl_cte_sql(pairs_cte: str = "dp") -> str:
    """SQL fragment defining CTE ``dl(s1, s2, dist)`` from a CTE named
    ``pairs_cte`` with DISTINCT columns (s1, s2), both non-NULL.

    Splice into a WITH chain after the pairs CTE (fragment starts with a
    CTE name, no leading WITH/comma). Distance only — callers derive the
    reference similarity as ``1 - dist / greatest(len1, len2)`` with the
    empty-string rules of ``src/matcher.py:232-241``.
    """
    # mat[x][y] (1-based list indexing) == kernel d[:, x-1, y-1]; kernel
    # cell for 1-based char pair (i, j) is d[:, i+1, j+1] == mat[i+2][j+2]
    return f"""dl_state AS (
    WITH RECURSIVE st AS (
        SELECT s1, s2,
               length(s1) AS l1, length(s2) AS l2,
               length(s1) + length(s2) AS maxd,
               1 AS i,
               [
                 list_transform(range(0, length(s2) + 2),
                                c -> length(s1) + length(s2)),
                 list_prepend(length(s1) + length(s2),
                              range(0, length(s2) + 1))
               ] AS mat
        FROM {pairs_cte}
        WHERE length(s1) > 0 AND length(s2) > 0
        UNION ALL
        SELECT s1, s2, l1, l2, maxd, i + 1,
               list_append(mat,
                 list_prepend(maxd, list_prepend(i,
                   list_transform(range(1, l2 + 1), j ->
                     least(
                       j + list_min(list_transform(range(1, j + 1), jp ->
                         least(
                           -- diagonal: kernel d[:, i, jp] == mat[i+1][jp+1]
                           mat[i + 1][jp + 1]
                             + CASE WHEN substr(s2, jp, 1) = substr(s1, i, 1)
                                    THEN 0 ELSE 1 END,
                           -- up: kernel d[:, i, jp+1] == mat[i+1][jp+2]
                           mat[i + 1][jp + 2] + 1,
                           -- transposition via last-occurrence indices
                           mat[coalesce(list_max(list_filter(range(1, i),
                                 ii -> substr(s1, ii, 1) = substr(s2, jp, 1))), 0) + 1]
                              [coalesce(list_max(list_filter(range(1, jp),
                                 jj -> substr(s2, jj, 1) = substr(s1, i, 1))), 0) + 1]
                             + (i - coalesce(list_max(list_filter(range(1, i),
                                 ii -> substr(s1, ii, 1) = substr(s2, jp, 1))), 0) - 1)
                             + 1
                             + (jp - coalesce(list_max(list_filter(range(1, jp),
                                 jj -> substr(s2, jj, 1) = substr(s1, i, 1))), 0) - 1)
                         ) - jp)),
                       i + j))
                 )))
        FROM st
        WHERE i <= l1
    )
    SELECT s1, s2, l1, l2, mat FROM st WHERE i = l1 + 1
),
dl AS (
    SELECT s1, s2, mat[l1 + 2][l2 + 2] AS dist FROM dl_state
    UNION ALL
    SELECT s1, s2, CAST(greatest(length(s1), length(s2)) AS BIGINT) AS dist
    FROM {pairs_cte}
    WHERE length(s1) = 0 OR length(s2) = 0
)"""
