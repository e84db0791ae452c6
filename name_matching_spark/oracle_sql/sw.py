"""Smith-Waterman local-alignment score as PURE DuckDB SQL.

Companion to ``oracle_sql/jw.py`` / ``oracle_sql/dl.py``: renders the
integer-scored SW DP (match +2, mismatch/gap -1 —
``core.similarity.smith_waterman_score`` / ``kernels.batch_sw_score``) as a
recursive CTE so the SW comparator gets a driver-exact oracle.

Shape: only the PREVIOUS DP row rides the recursion (SW has no
transposition lookback, unlike DL's full-matrix carry). The within-row
left-neighbor gap dependency ``H[i][j] = max(t[j], H[i][j-1] - 1)`` is
eliminated with the max-plus prefix form::

    H[i][j] = max_{j'<=j}(t[j'] + j') - j

where ``t[j] = greatest(0, diag + s_ij, up - 1)`` has no left dependency —
each row is ONE list_transform (O(L2^2) per row via the inner prefix scan,
irrelevant at name lengths). The running best folds the PREVIOUS row's
list_max each step; the final SELECT folds the last row.

Tested bit-equal to the scalar oracle by ``tests/test_sql_oracle_jw.py``.
"""

from __future__ import annotations

__all__ = ["sw_cte_sql"]


def sw_cte_sql(pairs_cte: str = "swp") -> str:
    """SQL fragment defining CTE ``sw(s1, s2, best)`` from a CTE named
    ``pairs_cte`` with DISTINCT columns (s1, s2), both non-NULL.

    Splice into a WITH chain after the pairs CTE (fragment starts with a
    CTE name, no leading WITH/comma). Integer score only — callers derive
    the normalized similarity as
    ``CAST(best AS DOUBLE) / (2 * least(length(s1), length(s2)))`` with
    the empty rules (both empty -> 1.0, one empty -> 0.0).
    """
    # prev is 1-based: prev[j] == H[i][j-1]; diag for cell (i+1, j) is
    # prev[j], up is prev[j+1]
    return f"""sw AS (
    WITH RECURSIVE st AS (
        SELECT s1, s2,
               length(s1) AS l1, length(s2) AS l2,
               0 AS i,
               list_transform(range(0, length(s2) + 1), x -> 0) AS prev,
               0 AS best
        FROM {pairs_cte}
        WHERE length(s1) > 0 AND length(s2) > 0
        UNION ALL
        SELECT s1, s2, l1, l2, i + 1,
               list_prepend(0, list_transform(range(1, l2 + 1), j ->
                   list_max(list_transform(range(1, j + 1), jp ->
                       greatest(0,
                                prev[jp] + CASE WHEN substr(s1, i + 1, 1)
                                                     = substr(s2, jp, 1)
                                                THEN 2 ELSE -1 END,
                                prev[jp + 1] - 1) + jp)) - j)),
               greatest(best, list_max(prev))
        FROM st WHERE i < l1
    )
    SELECT s1, s2, greatest(best, list_max(prev)) AS best
    FROM st WHERE i = l1
    UNION ALL
    SELECT s1, s2, 0 AS best
    FROM {pairs_cte} WHERE length(s1) = 0 OR length(s2) = 0
)"""
