"""Column-level data profiling — the ingest-side data-quality report.

One narrow unpivot pass plus censuses; every statistic is an exact integer,
a string, or a KMV sketch estimate (itself an exact integer), so the DuckDB
oracle reproduces the whole report bit-for-bit. This is the profiling step a
linkage pipeline runs BEFORE choosing blocking keys and validators: null and
empty rates say which fields can block, distinct estimates say which fields
discriminate, top values expose placeholder pollution ('', 'N/A', ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from name_matching_spark.operators.sketches import kmv_distinct

__all__ = ["profile_columns", "profile_table"]


def profile_table(df: DataFrame, cols: list, kmv_k: int = 64) -> DataFrame:
    """Per-column profile over ``cols`` (compared as strings — pass string
    columns or accept cast semantics).

    Output, one row per column: ``col_name, n_rows, n_null, n_empty,
    n_distinct`` (exact, audit), ``est_distinct`` (KMV bottom-k sketch —
    the statistic a 100 TB run would keep when the exact count is too
    expensive), ``min_value, max_value`` (string collation, nulls
    ignored), ``top_value, top_count`` (modal value, ties by value asc),
    ``avg_len_ppm`` (mean length of non-null values, exact ppm).

    Scale shape: the unpivot is a narrow map (rows x |cols|, value column
    only); the base census map-side combines per column; the top-value and
    KMV censuses shuffle on (column, value) — skew bounded by the hottest
    value, with only counts/hashes flowing. No window over the row stream.
    """
    long = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("_cv")
    ).select("_cv.col_name", "_cv.value")
    base = long.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("value").isNull().cast("bigint")).cast("long").alias("n_null"),
        F.sum(F.when(F.col("value") == "", 1).otherwise(0))
        .cast("long")
        .alias("n_empty"),
        F.count_distinct(F.col("value")).cast("long").alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum(F.coalesce(F.length("value"), F.lit(0))).alias("_len_sum"),
    )
    top = (
        long.filter(F.col("value").isNotNull())
        .groupBy("col_name", "value")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("col_name")
        .agg(
            F.min_by(
                F.struct(
                    F.col("value").alias("top_value"),
                    F.col("_n").alias("top_count"),
                ),
                F.struct((-F.col("_n")).alias("a"), F.col("value").alias("b")),
            ).alias("_t")
        )
        .select(
            "col_name",
            F.col("_t.top_value").alias("top_value"),
            F.col("_t.top_count").cast("long").alias("top_count"),
        )
    )
    est = kmv_distinct(
        long.filter(F.col("value").isNotNull()),
        "col_name",
        "value",
        k=kmv_k,
        include_exact=False,
    ).select("col_name", "est_distinct")
    return (
        base.join(top, "col_name", "left")
        .join(est, "col_name", "left")
        .select(
            "col_name",
            "n_rows",
            "n_null",
            "n_empty",
            "n_distinct",
            F.coalesce("est_distinct", F.lit(0)).cast("long").alias("est_distinct"),
            "min_value",
            "max_value",
            "top_value",
            F.coalesce("top_count", F.lit(0)).cast("long").alias("top_count"),
            F.expr(
                "CAST(_len_sum * 1000000 DIV greatest(n_rows - n_null, 1) "
                "AS BIGINT)"
            ).alias("avg_len_ppm"),
        )
    )


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
