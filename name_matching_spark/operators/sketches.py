"""Distinct-count sketches — engine-portable, deterministic, no UDFs.

KMV (k-minimum-values, a.k.a. bottom-k) cardinality estimation: hash every
value to a uniform 56-bit integer (first 14 hex chars of md5 — portable
across Spark and DuckDB), keep the k smallest distinct hashes per group, and
estimate the distinct count from the k-th minimum: D ~= (k-1) * 2^56 / h_k
(Bar-Yossef et al., RANDOM'02; the same bottom-k family HyperLogLog refines).
Unlike Spark's approx_count_distinct (HLL++, whose registers are not
reproducible in SQL), every intermediate here is an exact integer, so the
DuckDB oracle reproduces the estimate bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmv_distinct", "kmv_pairwise_overlap", "weighted_sample", "KMV_HASH_HEX", "KMV_HASH_SPACE"]

KMV_HASH_HEX = 14  # 56-bit hashes: (k-1) * 2^56 stays inside BIGINT for k <= 127
KMV_HASH_SPACE = 1 << (4 * KMV_HASH_HEX)


def _kmv_sketches(
    df: DataFrame, group_col: str, value_col: str, k: int
) -> DataFrame:
    """Per-group bottom-k hash sketch ``(group, _bk array<bigint>)`` via the
    two-phase merge (see :func:`kmv_distinct`)."""
    if not 2 <= k <= 127:
        raise ValueError("k must be in [2, 127] (56-bit estimator bound)")
    hashed = df.select(
        F.col(group_col),
        F.conv(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, KMV_HASH_HEX),
            16,
            10,
        )
        .cast("bigint")
        .alias("_h"),
    )
    part = hashed.groupBy(group_col, F.spark_partition_id().alias("_p")).agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_bk")
    )
    return part.groupBy(group_col).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_bk")))),
            1,
            k,
        ).alias("_bk")
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    include_exact: bool = True,
) -> DataFrame:
    """Per-group distinct-count estimate via a k-minimum-values sketch.

    Two-phase bottom-k — the distributed shape that never shuffles the
    value stream: (1) per (group, input-partition), collect the partition's
    distinct hashes and keep the k smallest (collect_set dedups locally;
    memory per task is bounded by the partition's group share, the emitted
    state by k); (2) per group, merge the partition sketches — flatten,
    array_distinct, sort, slice — each merge input is <= k values per
    partition, so the wide stage moves O(k x partitions) integers per
    group, never the values themselves. No global dropDuplicates shuffle
    anywhere on the sketch path.

    Estimate: if the merged sketch holds fewer than k hashes the group's
    support was seen in full (estimate = sketch size, exact modulo md5
    collisions); otherwise D = (k-1) * 2^56 DIV h_k, an exact integer
    division both engines compute identically.

    ``include_exact`` (default True, for audit/demo) adds the true distinct
    count and the estimate's signed error in ppm — a full count(DISTINCT)
    pass a production run at scale would skip.

    Output: (group, n_sketch, kth_min_hash, est_distinct [, n_distinct_exact,
    err_ppm]).
    """
    merged = _kmv_sketches(df, group_col, value_col, k)
    n_sketch = F.size("_bk")
    kth = F.element_at("_bk", k)
    out = merged.select(
        F.col(group_col),
        n_sketch.cast("long").alias("n_sketch"),
        F.when(n_sketch >= k, kth).alias("kth_min_hash"),
        F.when(n_sketch < k, n_sketch.cast("long"))
        .otherwise(
            F.expr(
                f"CAST(({k} - 1) * CAST({KMV_HASH_SPACE} AS BIGINT) "
                f"DIV greatest(element_at(_bk, {k}), 1) AS BIGINT)"
            )
        )
        .alias("est_distinct"),
    )
    if not include_exact:
        return out
    exact = (
        df.select(group_col, value_col)
        .groupBy(group_col)
        .agg(F.count_distinct(F.col(value_col)).alias("n_distinct_exact"))
    )
    return out.join(exact, group_col).withColumn(
        "err_ppm",
        F.expr(
            "CAST((est_distinct - n_distinct_exact) * 1000000 "
            "DIV greatest(n_distinct_exact, 1) AS BIGINT)"
        ),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "es",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES, 2006): each row gets key = ln(u) / w with
    u = (h + 1) / 2^56 derived from a 56-bit md5 hash of (seed, id), and
    the k largest keys are the sample — inclusion probability is
    proportional to weight, the sample is reproducible from the seed, and
    both engines compute the identical IEEE expression. This is the
    operational form of the q116 mixing weights: actually DRAWING the
    rebalanced corpus instead of just reporting shares.

    Zero-weight rows are excluded (their inclusion probability is 0; this
    also keeps ln defined). Shape: one narrow hash projection, then a
    global top-k. The single-partition window is the rank's only global
    stage; at 100 TB, pre-filter with a per-partition top-k first
    (bottom-k of -key per partition, the KMV merge shape) so the global
    window sees O(k x partitions) rows, not the corpus.

    Output: (rank, id, weight, sample_key), rank 1 = largest key.
    """
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))),
            1,
            KMV_HASH_HEX,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(KMV_HASH_SPACE))
    keyed = (
        df.filter(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            (F.log(u) / F.col(weight_col).cast("double")).alias("sample_key"),
        )
    )
    w = Window.orderBy(F.desc("sample_key"), F.asc(id_col))
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("rank").cast("long").alias("rank"), id_col, "weight", "sample_key")
    )


def kmv_pairwise_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Sketch ALGEBRA: pairwise domain-overlap estimates from the bottom-k
    sketches alone — union distinct (bottom-k of the merged sketch is the
    union's bottom-k, the KMV closure property), intersection by
    inclusion-exclusion (floored at 0), and a Jaccard estimate in exact
    ppm. The cross-domain contamination/affinity report a corpus pipeline
    wants for every (source, source) pair WITHOUT ever joining the value
    streams: after the one sketch pass, each pair costs O(k).

    Output per unordered group pair: (g1, g2, est_1, est_2, est_union,
    est_intersection, jaccard_est_ppm). Estimates are the q115 integer
    form, so the whole report is engine-exact.
    """
    sk = _kmv_sketches(df, group_col, value_col, k)
    scale = (k - 1) * KMV_HASH_SPACE  # fits BIGINT for k <= 127

    def _est(name: str):
        n = F.size(F.col(name))
        return F.when(n < k, n.cast("long")).otherwise(
            F.expr(
                f"CAST({scale} DIV greatest(element_at({name}, {k}), 1) "
                f"AS BIGINT)"
            )
        )

    a = sk.select(
        F.col(group_col).alias("g1"), F.col("_bk").alias("_bk1")
    )
    b = sk.select(
        F.col(group_col).alias("g2"), F.col("_bk").alias("_bk2")
    )
    pairs = a.join(b, F.col("g1") < F.col("g2"))
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("_bk1"), F.col("_bk2")))),
        1,
        k,
    )
    out = pairs.select(
        "g1",
        "g2",
        F.col("_bk1").alias("_a"),
        F.col("_bk2").alias("_b"),
        merged.alias("_u"),
    )
    est1 = _est("_a")
    est2 = _est("_b")
    estu = _est("_u")
    return (
        out.select(
            "g1",
            "g2",
            est1.alias("est_1"),
            est2.alias("est_2"),
            estu.alias("est_union"),
        )
        .withColumn(
            "est_intersection",
            F.greatest(
                F.col("est_1") + F.col("est_2") - F.col("est_union"), F.lit(0)
            ).cast("long"),
        )
        .withColumn(
            "jaccard_est_ppm",
            F.expr(
                "CAST(est_intersection * 1000000 DIV greatest(est_union, 1) "
                "AS BIGINT)"
            ),
        )
    )
