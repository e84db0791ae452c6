"""Reference Jaro-Winkler as PURE DuckDB SQL (no UDF registration).

The driver's correctness gate runs ``oracle_sql()`` strings in a plain
DuckDB connection, so the flagship fuzzy-scoring query can only get an
exact value-hash oracle if Jaro-Winkler itself is expressible in SQL.
This module emits a recursive-CTE rendition of the reference algorithm
(``/root/reference/src/matcher.py:94-187``: greedy windowed matching,
half transpositions, prefix bonus WITHOUT the 0.7 gate, both-empty -> 1.0,
one-empty -> 0.0) that is bit-identical to the numpy kernel
(``functions/kernels.py:_batch_jaro_raw`` / ``_batch_jw_raw``) because the
float expression replicates the kernel's operation order exactly:

    jaro = (m/len1 + m/len2 + (m - t)/m) / 3.0        (left-assoc adds)
    jw   = jaro + (plen * 0.1) * (1.0 - jaro)

Intended use: ``WITH sp AS (SELECT DISTINCT s1, s2 FROM ...), <jw_cte_sql>
SELECT ... FROM jw`` — the caller dedups string pairs first (names repeat
heavily), computes JW once per distinct pair, and joins back.  The
recursive CTE carries every (s1, s2) pair through ``i = 1..len(s1)``
iterations of the greedy matcher; the matched-flag mask of s2 is a
'0'/'1' string, the matched chars of s1 accumulate in order.

Tested equal (bit-exact) to the scalar oracle by
``tests/test_sql_oracle_jw.py`` (hypothesis + golden values).
"""

from __future__ import annotations

__all__ = ["jw_cte_sql", "JW_EDGE_CASE"]

# CASE wrapper applying the reference's empty rules around the computed
# core value (matcher.py:166-173). Usage: JW_EDGE_CASE.format(s1=..., s2=...,
# core=...).
JW_EDGE_CASE = (
    "CASE WHEN length({s1}) = 0 AND length({s2}) = 0 THEN 1.0 "
    "WHEN length({s1}) = 0 OR length({s2}) = 0 THEN 0.0 "
    "ELSE {core} END"
)


def jw_cte_sql(pairs_cte: str = "sp") -> str:
    """SQL fragment defining CTE ``jw(s1, s2, jw)`` from a CTE named
    ``pairs_cte`` with DISTINCT columns (s1, s2), both non-NULL.

    Splice into a WITH chain:  ``WITH {pairs_cte} AS (...), <this> ...``
    (the fragment starts with the CTE name, no leading WITH/comma).
    """
    return f"""jw_state AS (
    -- greedy windowed matching (matcher.py:107-124), one recursion step per
    -- 1-based position i of s1; w = max(len)//2 - 1 floored at 0
    WITH RECURSIVE st AS (
        SELECT s1, s2,
               length(s1) AS l1, length(s2) AS l2,
               greatest(greatest(length(s1), length(s2)) // 2 - 1, 0) AS w,
               1 AS i,
               repeat('0', length(s2)) AS mask,
               '' AS m1
        FROM {pairs_cte}
        WHERE length(s1) > 0 AND length(s2) > 0
        UNION ALL
        SELECT s1, s2, l1, l2, w, i + 1,
               CASE WHEN j > 0
                    THEN substr(mask, 1, j - 1) || '1' || substr(mask, j + 1)
                    ELSE mask END,
               CASE WHEN j > 0 THEN m1 || ch ELSE m1 END
        FROM (
            SELECT *,
                   substr(s1, i, 1) AS ch,
                   coalesce(list_filter(
                       range(greatest(1, i - w), least(l2, i + w) + 1),
                       j -> substr(mask, j, 1) = '0'
                            AND substr(s2, j, 1) = substr(s1, i, 1)
                   )[1], 0) AS j
            FROM st
        )
        WHERE i <= l1
    )
    SELECT * FROM st WHERE i = l1 + 1
),
jw_final AS (
    SELECT s1, s2, l1, l2,
           length(m1) AS m,
           m1,
           -- matched chars of s2 in position order (matcher.py:127-138)
           array_to_string(list_transform(
               list_filter(range(1, l2 + 1), p -> substr(mask, p, 1) = '1'),
               p -> substr(s2, p, 1)), '') AS m2
    FROM jw_state
),
jw_core AS (
    SELECT s1, s2,
           CASE WHEN m = 0 THEN 0.0 ELSE
             -- jaro, kernel operation order: (m/l1 + m/l2 + (m-t)/m) / 3.0
             (m / l1 + m / l2
              + (m - (len(list_filter(range(1, m + 1),
                         p -> substr(m1, p, 1) <> substr(m2, p, 1))) // 2)) / m
             ) / 3.0
           END AS jaro,
           CASE WHEN substr(s1, 1, 4) = substr(s2, 1, 4) THEN 4
                WHEN substr(s1, 1, 3) = substr(s2, 1, 3) THEN 3
                WHEN substr(s1, 1, 2) = substr(s2, 1, 2) THEN 2
                WHEN substr(s1, 1, 1) = substr(s2, 1, 1) THEN 1
                ELSE 0 END AS plen
    FROM jw_final
),
jw_nonempty AS (
    -- jw = jaro + (plen * 0.1) * (1.0 - jaro), kernel order
    SELECT s1, s2, jaro + (plen * 0.1::DOUBLE) * (1.0 - jaro) AS jw
    FROM jw_core
),
jw AS (
    -- reattach empty-side pairs with the reference edge rules
    SELECT s1, s2, jw FROM jw_nonempty
    UNION ALL
    SELECT s1, s2,
           CASE WHEN length(s1) = 0 AND length(s2) = 0 THEN 1.0 ELSE 0.0 END AS jw
    FROM {pairs_cte}
    WHERE length(s1) = 0 OR length(s2) = 0
)"""
