"""Column profiling: the data-quality census a linkage run performs before
trusting its inputs (extends the reference's schema-validation surface,
``src/data_handler.py`` valid/invalid split, to per-column statistics).

Scale shape: the table is melted to (column, value) long form — a map-only
``stack`` projection, no UDF — and ONE groupBy(column) computes every
metric, so the whole profile is a single shuffle of n_rows x n_cols narrow
rows regardless of table width. Exact ``count(distinct)`` per column rides
the same aggregation. (At 100 TB swap in ``approx_count_distinct`` for the
distinct column if exactness isn't required — same plan shape.)

Engine-exact output: counts are BIGINT, min/max are lexicographic over the
stringified values (identical in any engine for ASCII data), and mean
length is integer ppm — no doubles anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile of ``cols``: row/null/distinct counts, lexicographic
    min/max of the stringified value, total and mean (ppm) string length.

    Values are CAST to string first so heterogeneous columns share one long
    frame; for cross-engine-stable output profile string/integer columns
    (float formatting differs between engines).

    Output: ``col_name, n_rows, n_null, n_distinct, min_val, max_val,
    sum_len, avg_len_ppm`` — one row per profiled column, all counts exact.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    pairs = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
    long = df.select(
        F.expr(f"stack({len(cols)}, {pairs})").alias("col_name", "value")
    )
    return (
        long.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count("value")).alias("n_null"),
            F.countDistinct("value").alias("n_distinct"),
            F.min("value").alias("min_val"),
            F.max("value").alias("max_val"),
            F.sum(F.length("value")).alias("sum_len"),
        )
        .select(
            "col_name",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_null").cast("long").alias("n_null"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "min_val",
            "max_val",
            F.coalesce(F.col("sum_len"), F.lit(0)).cast("long").alias("sum_len"),
            F.expr(
                "CAST(coalesce(sum_len, 0) * 1000000 "
                "DIV greatest(n_rows - n_null, 1) AS BIGINT)"
            ).alias("avg_len_ppm"),
        )
    )
